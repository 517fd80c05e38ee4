package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal, Similarity}

class ExtSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("audio energy: byte round-trip matches plain-Scala PCM16 windows incl. sign") {
    import spark.implicits._
    // doc 2000 starts at raw 62000 >= 32768 — exercises the two's-complement
    // branch; docs 0/1 cover 1 and 2 windows
    val docs = Seq((0L, "x"), (1L, "x"), (2000L, "x")).toDF("doc_id", "text")
    val got = ext.Multimodal.audioEnergy(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val W = ext.Multimodal.AudioWindow
    val expected = Seq(0L, 1L, 2000L).flatMap { doc =>
      val n = ((doc % 4) + 1).toInt * W
      (0 until n).map { i =>
        val raw = (doc * 31 + i * 17) % 65536
        val s = if (raw >= 32768) raw - 65536 else raw
        (i / W, s * s)
      }.groupBy(_._1).map { case (w, xs) =>
        (doc, w.toLong) -> ((n.toLong, xs.map(_._2).sum))
      }
    }.toMap
    assert(got == expected)
    // spot-check a hand value: doc 0 window 0 = 289 * sum(i^2, 0..63)
    assert(got((0L, 0L))._2 == 289L * 85344L)
  }

  test("checksum: partitioning-invariant; content swap moves content_sig only") {
    import spark.implicits._
    val docs = Seq((1L, "alpha", "s1"), (2L, "beta", "s1"), (3L, "gamma", "s2"))
      .toDF("doc_id", "text", "source")
    def sig(df: org.apache.spark.sql.DataFrame) =
      ext.Pipeline.checksum(df).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
    val base = sig(docs)
    assert(sig(docs.repartition(7)) == base) // order/partitioning free
    // swap s1's texts between rows: ids and counts identical, and the xor
    // fold is symmetric, so the per-source signature is unchanged too —
    // exactly the documented parity limit
    val swapped = Seq((1L, "beta", "s1"), (2L, "alpha", "s1"), (3L, "gamma", "s2"))
      .toDF("doc_id", "text", "source")
    assert(sig(swapped) == base)
    // replacing content DOES trip the signature
    val edited = Seq((1L, "alpha!", "s1"), (2L, "beta", "s1"), (3L, "gamma", "s2"))
      .toDF("doc_id", "text", "source")
    val e = sig(edited)
    assert(e("s1")._4 != base("s1")._4 && e("s2") == base("s2"))
  }

  test("centroid outliers: exact integer distances to the rounded group mean") {
    import spark.implicits._
    // en centroid: mean of (1e6,0),(0,1e6),(1e6,1e6) = (666666.67, 666666.67)
    // -> rounded (666667, 666667); dist docs 1,2 = 333333^2 + 666667^2 =
    // 555555777778; doc 3 = 2 * 333333^2 = 222221777778. de is a singleton.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)), (3L, Array(1.0f, 1.0f)),
      (4L, Array(2.0f, 0.0f))).toDF("vec_id", "embedding")
    val docs = Seq((1L, "en"), (2L, "en"), (3L, "en"), (4L, "de")).toDF("doc_id", "lang")
    val got = ext.Similarity.centroidOutliers(emb, docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang"), r.getAs[Long]("dist2"), r.getAs[Long]("rank")))).toMap
    assert(got == Map(
      1L -> (("en", 555555777778L, 1L)),
      2L -> (("en", 555555777778L, 2L)),
      3L -> (("en", 222221777778L, 3L)),
      4L -> (("de", 0L, 1L))))
  }

  test("psi drift: hand-computed two-bin value, Laplace-smoothed") {
    import spark.implicits._
    // bins: 0 -> (ca=1, cb=2), 1 -> (ca=2, cb=0); na=3, nb=2, B=2
    // pa0=2/5, pb0=3/4: term (0.4-0.75)*ln(0.4/0.75) = 0.220013
    // pa1=3/5, pb1=1/4: term (0.6-0.25)*ln(2.4)      = 0.306414
    val events = Seq(
      ("click", 0.5), ("click", 1.5), ("click", 1.5),
      ("purchase", 0.5), ("purchase", 0.5)).toDF("event_type", "value")
    val r = ext.Drift.psiDrift(events).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 2L)))
    assert(r.getDouble(3) == 0.526427)
  }

  test("psi series: a day missing a reference bucket still pays that term") {
    import spark.implicits._
    val DAY = 86400000000L
    // day0: buckets {0,1}; day1: bucket {0} only. ref: {0:2, 1:1}, B=2.
    // day0 psi = 0.018232 + 0.022314 = 0.040546
    // day1 psi = 0.007024 + 0.012155 = 0.019179 (second term is the
    // missing bucket's — the grid join must generate it)
    val events = Seq((0L, 0.5), (1L, 1.5), (DAY, 0.5))
      .toDF("us", "value")
      .withColumn("ts", expr("cast(timestamp_micros(us) as timestamp_ntz)"))
      .withColumn("event_type", org.apache.spark.sql.functions.lit("click"))
    val got = ext.Drift.psiSeries(events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map(0L -> ((2L, 0.040546)), 1L -> ((1L, 0.019179))))
  }

  test("spell pairs: substitution, insertion, and the planted typo are all found") {
    import spark.implicits._
    // doc 7 (doc_id % 7 == 0, first word >= 5 chars) gets 'wndow' planted;
    // batch~hatch is a substitution pair, scan~scans an insertion pair
    val docs = Seq(
      (7L, "window scan sort merge"),
      (1L, "batch batch hatch"),
      (2L, "scans scan scan")).toDF("doc_id", "text")
    val got = ext.TextOps.spellPairs(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("batch", "hatch") -> ((2L, 1L)),
      ("scan", "scans") -> ((3L, 1L)),
      ("window", "wndow") -> ((1L, 1L))))
  }

  test("textrank: 5 integer iterations on 'a b a c', hand-computed") {
    import spark.implicits._
    // graph: w(a-b)=2, w(a-c)=1; W(a)=3, W(b)=2, W(c)=1. Contribution =
    // (((w*r) div W_u) * 17) div 20, r' = 150000 + sum. Five rounds by hand:
    // r1=(1850000, 716666, 433333), r2=(1127499, 1198333, 674166),
    // r3=(1741624, 788916, 469458), r4=(1219617, 1136919, 643459),
    // r5=(1663321, 841116, 495558)
    val docs = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val got = ext.TextOps.textRank(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(got == List((1L, "a", 1663321L), (2L, "b", 841116L), (3L, "c", 495558L)))
  }

  test("bpe train: weighted counts, lexicographic ties, greedy aaa overlap") {
    import spark.implicits._
    // words: aaa x1, banana x2, band x1. Hand-derived rounds:
    //  r1 (a,n)=5; r2 (b,an)=3; r3 tie {aa,ana,ban+an}=2 -> (a,a) lexic.;
    //  greedy on "aaa" gives [aa,a] (NOT [aa,aa]); r4 (an,a)=2;
    //  r5 (ban,ana)=2; r6 (aa,a)=1 (tie with (ban,d), "aa" < "ban")
    val docs = Seq((1L, "aaa banana"), (2L, "banana band")).toDF("doc_id", "text")
    val got = ext.TextOps.bpeTrain(docs, rounds = 6).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toList
      .sortBy(_._1)
    assert(got == List(
      (1L, "a", "n", 5L), (2L, "b", "an", 3L), (3L, "a", "a", 2L),
      (4L, "an", "a", 2L), (5L, "ban", "ana", 2L), (6L, "aa", "a", 1L)))
  }

  test("bpe apply: the training corpus round-trips through its own rules") {
    import spark.implicits._
    // same fixture as the trainer test; hand-applied rules in round order:
    //  aaa:    r3 (a,a) greedy -> [aa, a]; r6 (aa,a) -> [aaa]
    //  banana: r1 (a,n)x2 -> [b,an,an,a]; r2 (b,an) -> [ban,an,a];
    //          r4 (an,a) -> [ban,ana]; r5 -> [banana]
    //  band:   r1 -> [b,an,d]; r2 -> [ban,d]; no later rule matches
    val docs = Seq((1L, "aaa banana"), (2L, "banana band")).toDF("doc_id", "text")
    val rules = ext.TextOps.bpeTrain(docs, rounds = 6)
    val got = ext.TextOps.bpeApply(docs, rules, rounds = 6).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toList.sortBy(_._1)
    assert(got == List(
      ("aaa", 1L, 1L, "aaa"),
      ("banana", 2L, 1L, "banana"),
      ("band", 1L, 2L, "ban d")))
  }

  test("content split: exact duplicates can never straddle train and test") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta", "s1"),
      (2L, "alpha beta gamma delta", "s2"),  // duplicate text, other id+source
      (3L, "totally different words here", "s1"))
      .toDF("doc_id", "text", "source")
    val got = ext.Pipeline.contentSplit(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == got(2L), "identical text diverged across splits")
    // verdict is a pure function of text: rerunning yields identical rows
    val again = ext.Pipeline.contentSplit(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(again == got)
  }

  test("quality gate: bottom decile by composite score; boundary ties drop; tiny sources keep all") {
    import spark.implicits._
    // uniqDoc(i): i DISTINCT tokens, no stopwords, no punctuation, so the
    // composite collapses to two hand-checkable terms:
    // score = (400000 * min(i, 256)) div 256 + 300000 — monotone in i.
    def uniqDoc(i: Int) = (1 to i).map(k => s"w$k").mkString(" ")
    val big = (1 to 10).map(i => (i.toLong, uniqDoc(i), "big"))
    val tiny = (11 to 15).map(i => (i.toLong, uniqDoc(i - 10), "tiny"))
    // ties source: docs 21 AND 22 share the bottom score
    val ties = (21 to 30).map(i =>
      (i.toLong, uniqDoc(if (i <= 22) 1 else i - 20), "ties"))
    val out = ext.Pipeline.qualityGate((big ++ tiny ++ ties).toDF("doc_id", "text", "source"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // big: n=10, rank (10*10)//100 = 1 -> thr = doc 1's score
    // 400000 div 256 + 300000 = 1562 + 300000 = 301562; doc 1 dropped
    assert(out(1L) == ((301562L, 301562L, 0L)))
    assert(out(2L)._1 == 303125L) // 800000 div 256 = 3125
    (2 to 10).foreach(i => assert(out(i.toLong)._3 == 1L, s"doc $i"))
    // tiny: n=5, (10*5)//100 = 0 -> no threshold row, keep all at thr -1
    (11 to 15).foreach(i => assert(out(i.toLong)._2 == -1L && out(i.toLong)._3 == 1L))
    // ties: thr equals the shared bottom score -> BOTH boundary docs drop
    // (kept = score > thr), the other eight keep
    assert(out(21L)._3 == 0L && out(22L)._3 == 0L)
    (23 to 30).foreach(i => assert(out(i.toLong)._3 == 1L, s"doc $i"))
  }

  test("composite score: punctuation-heavy and repetitive docs score below clean prose") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near the riverbank today"),
      (2L, "the quick!! brown,, fox!!! jumps;; over,, a... lazy:: dog?? near!!! the. riverbank. today."),
      (3L, "spam spam spam spam spam spam spam spam spam spam spam spam spam")
    ).toDF("doc_id", "text")
    val s = docs.select($"doc_id", ext.TextOps.compositeScoreSpark.as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(2L) < s(1L), s"punctuation density must cost score: $s")
    assert(s(3L) < s(1L), s"repetition must cost score: $s")
  }

  test("dup-ngram fraction: boilerplate sharing flags; unique docs don't") {
    import spark.implicits._
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ") // a shared 12-token block
    def uniq(tag: String) = (1 to 20).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, boiler + " " + uniq("x")),  // 12-token boilerplate prefix
      (2L, boiler + " " + uniq("y")),  // same prefix, different tail
      (3L, uniq("z"))                  // fully unique
    ).toDF("doc_id", "text")
    val got = ext.Dedup.dupNgramFrac(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    // docs 1/2: 32 tokens -> 23 distinct 10-grams; the 3 grams fully inside
    // the shared 12-token block are duplicated (positions 1..3), the rest
    // straddle into the unique tail. 3/23 = 13% -> not flagged at 30%.
    assert(got(1L) == ((23L, 3L, 0L)), s"$got")
    assert(got(2L) == ((23L, 3L, 0L)), s"$got")
    assert(got(3L) == ((11L, 0L, 0L)), s"$got")
    // a doc that is MOSTLY boilerplate crosses the gate
    val heavy = Seq(
      (1L, boiler + " t1 t2"), (2L, boiler + " u1 u2"))
      .toDF("doc_id", "text")
    val h = ext.Dedup.dupNgramFrac(heavy).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    // 14 tokens -> 5 grams; 3 inside the shared block -> 60% -> flagged
    assert(h(1L) == ((3L, 1L)) && h(2L) == ((3L, 1L)), s"$h")
  }

  test("near-dup pairs: a true near-duplicate has high jaccard; LSH finds it") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"), // 1 token changed
      (3L, "z y x w v u t s r q")).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(docs).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getDouble(2) > 0.5))
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("incremental near-dup: new batch probes the corpus index") {
    import spark.implicits._
    // mod=10: docs 10 and 20 are "incoming"; 10 is a near-dup of corpus
    // doc 1, 20 matches nothing. 25-token base: one differing tail token
    // gives J = 23/25 = 0.92 >= the 0.9 drop threshold.
    val base = ('a' to 'y').map(_.toString).mkString(" ")
    val docs = Seq(
      (1L, base + " q1"),
      (2L, "z y x w v u t s r q p o n m l k j"),
      (10L, base + " r1"), // near-dup of 1
      (20L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3)))).toMap
    assert(out.keySet == Set(10L, 20L)) // corpus docs never re-judged
    assert(out(10L)._1 == 1L && out(10L)._2 == "drop")
    assert(out(20L) == ((-1L, "keep")))
  }

  test("snapshot delta: all four verdicts, hashes carried") {
    import spark.implicits._
    // 8: in both, unchanged; 21: %7 -> changed; 30: %10==0 -> added;
    // 9: %10==9 -> deleted
    val docs = Seq((8L, "alpha"), (21L, "beta"), (30L, "gamma"), (9L, "delta"))
      .toDF("doc_id", "text")
    val out = ext.Pipeline.snapshotDelta(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(8L -> "unchanged", 21L -> "changed",
      30L -> "added", 9L -> "deleted"))
  }

  test("redact: planted email and id are scrubbed and counted") {
    import spark.implicits._
    val docs = Seq((15L, "plain words here"), (7L, "nothing to see"))
      .toDF("doc_id", "text")
    val out = ext.TextOps.redact(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // 15: %5 plants an email (digits inside it are consumed by the email
    // redaction, not double-counted as an id); %3 plants ref 0000015
    assert(out(15L) == ((1L, 1L, "plain words here contact <EMAIL> asap ref <ID>")))
    assert(out(7L) == ((0L, 0L, "nothing to see")))
  }

  test("lm bits: add-one bigram cross-entropy matches hand computation") {
    import spark.implicits._
    // corpus: doc1 "a b a b", doc2 "a b c", doc3 "x" (no bigram).
    // bigram counts: (a,b)=3, (b,a)=1, (b,c)=1; left contexts a=3, b=2;
    // V=4 (a,b,c,x). p(b|a)=(3+1)/(3+4)=4/7, p(a|b)=p(c|b)=(1+1)/(2+4)=1/3.
    // bits: -log2(4/7)=0.807355, -log2(1/3)=1.584963 (rounded 6dp).
    // doc1: (2*0.807355 + 1.584963)/3 = 1.066558; doc2:
    // (0.807355+1.584963)/2 = 1.196159; doc3: no bigram -> 0.
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = ext.TextOps.lmBits(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((3L, 1.066558)))
    assert(out(2L) == ((2L, 1.196159)))
    assert(out(3L) == ((0L, 0.0)))
  }

  test("near-dup groups: chained duplicates collapse to one cluster, min id canonical") {
    import spark.implicits._
    // 1-2-3 form a CHAIN (1~2 and 2~3 are near-dups; 1~3 may or may not be
    // a pair) — components must merge them transitively. 4 is unrelated and
    // 5 shares no pair: both stay singleton canonical.
    val base = "a b c d e f g h i j k l m n o p"
    val docs = Seq(
      (1L, base + " q"),
      (2L, base + " r"), // 1 token from 1
      (3L, base + " s"), // 1 token from 2 (and from 1)
      (4L, "z y x w v u t s r q p o n m l k"),
      (5L, "completely different tokens here nothing shared at all with others x1 x2 x3 x4 x5 x6")
    ).toDF("doc_id", "text")
    val got = Dedup.nearDupGroups(docs, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((1L, 1L)), s"doc 1 canonical of its cluster: $got")
    assert(got(2L) == ((1L, 0L)), s"doc 2 joins cluster 1: $got")
    assert(got(3L) == ((1L, 0L)), s"doc 3 joins cluster 1 transitively: $got")
    assert(got(4L) == ((4L, 1L)) && got(5L) == ((5L, 1L)), s"singletons canonical: $got")
  }

  test("CC unroll tripwire: a chain beyond the covered diameter MISMATCHES exact CC") {
    import spark.implicits._
    // 40-vertex path graph, diameter 39. CcRounds = 3 covers diameters
    // <= ~2^(rounds+1)-1 = 15, so the unrolled kernel CANNOT fully collapse
    // this chain — the point of this fixture is to prove the documented
    // tripwire is real: an insufficient round count produces labels that
    // DIFFER from exact CC (and would therefore fail the recursive-CTE
    // oracle loudly), rather than passing quietly.
    val n = 40
    val verts = (0 until n).map(_.toLong).toDF("v")
    val chain = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("doc_a", "doc_b")
    val unrolled = Dedup.ccGroups(verts, chain, rounds = Dedup.CcRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unrolled.exists { case (_, l) => l != 0L },
      "40-chain must NOT fully collapse in 3 rounds — if it does, the " +
        "diameter-coverage analysis in Dedup.CcRounds' doc is wrong")
    // the convergence-checked form gets it right: every vertex labels 0
    val converged = Dedup.ccGroupsConverged(verts, chain)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(converged.forall(t => t._2 == 0L), s"converged CC must collapse the chain")
    assert(converged.count(_._3 == 1L) == 1, "exactly one canonical survivor")
    // and on a graph within the covered diameter, unrolled == converged
    val shortChain = (0 until 5).map(i => (i.toLong, i.toLong + 1)).toDF("doc_a", "doc_b")
    val sVerts = (0 until 6).map(_.toLong).toDF("v")
    val a = Dedup.ccGroups(sVerts, shortChain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val b = Dedup.ccGroupsConverged(sVerts, shortChain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(a == b && a.forall(_._2 == 0L))
  }

  test("converged near-dup groups match the unrolled form on harness-shaped data") {
    import spark.implicits._
    val base = "a b c d e f g h i j k l m n o p"
    val docs = Seq(
      (1L, base + " q"), (2L, base + " r"), (3L, base + " s"),
      (4L, "z y x w v u t s r q p o n m l k"),
      (5L, "completely different tokens here nothing shared at all with others x1 x2 x3 x4 x5 x6")
    ).toDF("doc_id", "text")
    val u = Dedup.nearDupGroups(docs, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val c = Dedup.nearDupGroupsConverged(docs, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(u == c)
  }

  test("jaccard ngram join: exact (no false negatives) vs brute-force all-pairs") {
    import spark.implicits._
    val base = "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 k11 k12 k13 k14 k15 k16 k17 k18 k19 k20"
    val docs = Seq(
      // 1-2: near-identical pair whose shingles are ALL shared with 3-6 too
      // (globally common) — a rare-token-only index would miss it; the
      // per-doc prefix filter must not.
      (1L, base + " z1"),
      (2L, base + " z2"),
      (3L, base), (4L, base), (5L, base), (6L, base),
      // 7-8: qualifying pair with unique vocabulary
      (7L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11"),
      (8L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u12"),
      // 9: sub-threshold overlap with 7
      (9L, "u1 u2 u3 u4 a1 a2 a3 a4 a5 a6 a7"),
      (10L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")
    ).toDF("doc_id", "text")
    val t = 0.8
    val got = Dedup.jaccardNgramPairs(docs, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over distinct shingle sets
    val sets = Dedup.shingles(docs).collect()
      .map(r => (r.getLong(0), r.getString(2)))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      i = (sets(a) & sets(b)).size
      if i.toDouble / (sets(a).size + sets(b).size - i) >= t
    } yield (a, b)).toSet
    assert(got == want, s"exact join must equal brute force: got=$got want=$want")
    assert(want.contains((1L, 2L)) && want.contains((7L, 8L)),
      "fixture sanity: both planted pairs qualify")
    assert(!want.exists(p => p._1 == 9L || p._2 == 9L),
      "fixture sanity: no pair involving the sub-threshold doc 9")
  }

  test("simhash pairs: byte-block pigeonhole equals brute-force hamming") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),   // near dup of 1
      (3L, "alpha beta gamma delta epsilon zeta"),  // identical to 1 (hamming 0)
      (4L, "one two three four five six seven"),
      (5L, "totally different words here again now")
    ).toDF("doc_id", "text")
    val got = ext.Dedup.simhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hs = ext.Dedup.simhash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = (for {
      a <- hs.keys; b <- hs.keys if a < b
      if java.lang.Long.bitCount(hs(a) ^ hs(b)) <= ext.Dedup.SimhashMaxHamming
    } yield (a, b)).toSet
    assert(got == want, s"pigeonhole must equal brute force: got=$got want=$want")
    assert(want.contains((1L, 3L)), "identical docs must pair (hamming 0)")
  }

  test("jaccard ngram bucket cap: oversized prefix buckets drop pairs, raising the cap recovers them") {
    import spark.implicits._
    // 6 near-identical (but unequal) docs sharing every shingle except a
    // unique suffix: all prefix buckets hold >= 5 docs
    val base = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12 p13 p14 p15 p16 p17 p18 p19 p20"
    val docs = (1 to 6).map(i => (i.toLong, s"$base u$i")).toDF("doc_id", "text")
    val capped = ext.Dedup.jaccardNgramPairs(docs, t = 0.8, bucketCap = 4).count()
    val full = ext.Dedup.jaccardNgramPairs(docs, t = 0.8, bucketCap = 1000).count()
    assert(capped == 0L, s"cap=4 must drop the 5+-doc buckets' pairs, got $capped")
    assert(full == 15L, s"uncapped must find all C(6,2) near-dup pairs, got $full")
  }

  test("bm25: term-dense short doc outranks term-sparse long doc; rare terms weigh more") {
    import spark.implicits._
    import graft.ext.TextOps
    val filler = Seq.fill(40)("x").mkString(" ")
    val docs = Seq(
      (1L, "hash table hash table hash scan"),      // dense in q1 terms, short
      (2L, s"hash table scan $filler"),             // all terms, but diluted
      (3L, s"hash $filler"),                        // one common term
      (4L, filler)                                  // no terms
    ).toDF("doc_id", "text")
    val r = TextOps.bm25TopK(docs, Seq((1L, "hash table scan")), k = 4)
      .orderBy($"rank").collect()
      .map(x => (x.getInt(1), x.getLong(2)))
    assert(r.map(_._2).toSeq == Seq(1L, 2L, 3L),
      s"expected dense doc first, diluted second, single-term third, no-term absent: ${r.toSeq}")
  }

  test("j6 sketch self-checks hold: HLL and quantile bounds all pass") {
    val r = ext.ExtQueries.queries("j6_sketch")(spark, "/root/testdata/sf0.001").head
    assert(r.getAs[Long]("cd_ok") == 1L,
      s"HLL estimate ${r.getAs[Long]("approx_orders")} vs exact ${r.getAs[Long]("exact_orders")}")
    assert(r.getAs[Long]("q50_rank_ok") == 1L)
    assert(r.getAs[Long]("q95_rank_ok") == 1L)
  }

  test("shingle/minhash/winnow handle short docs (< 3 tokens) row-locally") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),   // 2 shingles
      (2L, "a b"),       // too short: no shingles
      (3L, ""),          // empty
      (4L, "x y z")      // exactly one shingle
    ).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs).collect()
    assert(sh.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet ==
      Set((1L, 1, "a b c"), (1L, 2, "b c d"), (4L, 1, "x y z")))
    // short docs emit no signature row (same contract as the grouped form)
    assert(Dedup.minhash(docs).select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
    val fps = Dedup.winnow(docs).collect().map(r => r.getLong(0)).toSet
    assert(fps == Set(1L, 4L))
    // winnow window min: doc 1's two right-aligned windows collapse to the
    // stream min plus the tail hash -> at most 2 distinct fingerprints
    assert(Dedup.winnow(docs).filter($"doc_id" === 1L).count() <= 2)
  }

  test("knn cosine: identical vectors rank first with sim 1.0") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (5L, Array(1.0f, 0.0f, 0.0f)),   // identical to 0
      (6L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal
      (7L, Array(-1.0f, 0.0f, 0.0f)))  // opposite
      .toDF("vec_id", "embedding")
    val r = Similarity.knnCosine(emb, nQueries = 1, k = 3)
      .orderBy("rank").collect()
    assert(r(0).getAs[Long]("vid") == 5L && r(0).getAs[Long]("cos_sim_e6") == 1000000L)
    assert(r(1).getAs[Long]("vid") == 6L && r(1).getAs[Long]("cos_sim_e6") == 0L)
    assert(r(2).getAs[Long]("vid") == 7L && r(2).getAs[Long]("cos_sim_e6") == -1000000L)
  }

  test("filtered knn: neighbors share the query's label; pre-filter fills k") {
    import spark.implicits._
    // label 1: the query + 3 candidates (incl. a LOW-sim same-label one);
    // label 2: a near-identical vector that MUST be excluded by the filter
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 1),
      (5L, Array(0.9f, 0.1f, 0.0f), 2),   // best cosine overall — wrong label
      (6L, Array(0.8f, 0.2f, 0.0f), 1),
      (7L, Array(0.0f, 1.0f, 0.0f), 1),   // orthogonal, still returned (pre-filter fills k)
      (8L, Array(-1.0f, 0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.knnCosineFiltered(emb, nQueries = 1, k = 3)
      .orderBy("rank").collect()
    assert(r.length == 3, "pre-filter must fill k from same-label candidates")
    assert(r.forall(_.getAs[Long]("label") == 1L), "every neighbor shares the query's label")
    assert(r.map(_.getAs[Long]("vid")).toSeq == Seq(6L, 7L, 8L),
      "ranked by cosine within the filtered set (5 excluded despite top sim)")
  }

  test("hard negatives: all candidates carry a DIFFERENT label; hardest first") {
    import spark.implicits._
    // label 1: the query + a near-identical twin that MUST be excluded
    // (same label — it's a positive, not a negative);
    // label 2/3: the negative pool, incl. the HARD one (highest cosine)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 1),
      (5L, Array(0.99f, 0.01f, 0.0f), 1), // near-dup of the query — same label, excluded
      (6L, Array(0.9f, 0.1f, 0.0f), 2),   // the HARD negative: top sim among other labels
      (7L, Array(0.0f, 1.0f, 0.0f), 3),   // orthogonal negative
      (8L, Array(-1.0f, 0.0f, 0.0f), 2))  // easy negative
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.hardNegatives(emb, nQueries = 1, k = 3)
      .orderBy("rank").collect()
    assert(r.length == 3, "pre-filter must fill k from other-label candidates")
    assert(r.forall(_.getAs[Long]("neg_label") != 1L),
      "no negative may share the query's label")
    assert(r.map(_.getAs[Long]("vid")).toSeq == Seq(6L, 7L, 8L),
      "negatives ranked hardest-first (5 excluded despite top sim — it's a positive)")
  }

  test("hard negatives: single-label corpus yields an empty pool, not a crash or filler") {
    import spark.implicits._
    // every vector shares the query's label -> the pre-filter leaves no
    // candidates; the correct answer is ZERO rows (no silent fallback to
    // same-label "negatives")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 7),
      (5L, Array(0.9f, 0.1f), 7),
      (6L, Array(0.0f, 1.0f), 7))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.hardNegatives(emb, nQueries = 1, k = 3).count() == 0L)
  }

  test("bloom probe on the harness corpus: superset invariant (no false negatives)") {
    import spark.implicits._
    // every exact duplicate MUST be a bloom hit on real data, per doc —
    // the no-false-negatives law, checked corpus-wide not just on the
    // crafted fixture
    val r = ext.Dedup.bloomLineProbe(
        Tables.documents(spark, "/root/testdata/sf0.001"))
      .agg(sum(when($"n_bloom_dup" < $"n_exact_dup", 1L).otherwise(0L)).as("viol"),
        sum($"n_false_pos").as("fp"), sum($"n_exact_dup").as("ex"))
      .collect()(0)
    assert(r.getLong(0) == 0L, "a doc reported fewer bloom hits than exact dups")
    assert(r.getLong(1) >= 0L && r.getLong(2) > 0L,
      "the harness corpus must carry exact line dups for the invariant to bite")
  }

  test("source overlap: hand-computed Jaccard; zero-overlap pairs present in the matrix") {
    import spark.implicits._
    // source A: shingles {a b c, b c d}; source B shares exactly {b c d}
    // plus its own {c d e}; source C shares nothing. |A|=2 |B|=2 |C|=1,
    // A∩B=1 -> J=1/3; A∩C=B∩C=0 but the pairs must still emit rows.
    val docs = Seq(
      (1L, "a b c d", "A"),      // shingles: abc, bcd
      (2L, "b c d e", "B"),      // shingles: bcd, cde
      (3L, "x y z", "C")         // shingle: xyz
    ).toDF("doc_id", "text", "source")
    val got = ext.Dedup.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")),
      s"full upper triangle expected: ${got.keySet}")
    assert(got(("A", "B")) == ((2L, 2L, 1L, 333333L)), s"A-B overlap wrong: $got")
    assert(got(("A", "C")) == ((2L, 1L, 0L, 0L)), s"zero pair must emit: $got")
    assert(got(("B", "C")) == ((2L, 1L, 0L, 0L)), s"zero pair must emit: $got")
  }

  test("BPE decode: every harness doc round-trips losslessly; a corrupt table is caught") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rules = ext.TextOps.bpeTrain(docs)
    val applied = ext.TextOps.bpeApply(docs, rules)
    val enc = ext.TextOps.bpeEncodeDocs(docs, applied)
    val rt = ext.TextOps.bpeDecodeDocs(docs, enc, applied)
    val bad = rt.filter($"roundtrip_ok" =!= 1L).count()
    assert(bad == 0L, s"$bad docs failed the tokenizer round-trip")
    // n_chars must equal the original word-character mass per doc
    val mism = rt.join(docs.select($"doc_id",
        length(concat_ws("", expr("regexp_extract_all(text, '[a-z]+', 0)")))
          .cast("long").as("wc")), Seq("doc_id"))
      .filter($"n_chars" =!= $"wc").count()
    assert(mism == 0L, "decoded character mass diverged from the word stream")
    // negative control: swapping two symbols' spellings must be CAUGHT —
    // the law is falsifiable, not vacuous
    val syms = applied.select(explode(split($"toks", " ")).as("s")).distinct()
      .orderBy($"s").limit(2).collect().map(_.getString(0))
    assert(syms.length == 2)
    val corrupted = applied.withColumn("toks",
      regexp_replace($"toks", java.util.regex.Pattern.quote(syms(0)),
        syms(0) + syms(0)))
    val badRt = ext.TextOps.bpeDecodeDocs(docs, enc, corrupted)
      .filter($"roundtrip_ok" === 0L).count()
    assert(badRt > 0L, "a corrupted symbol table must break the round-trip")
  }

  test("curation funnel: stages chain, counts are monotone, eval slice leaves at decontam") {
    import spark.implicits._
    val rows = ext.Pipeline.curationFunnel(
        Tables.documents(spark, "/root/testdata/sf0.001"))
      .orderBy($"stage_no").collect()
    assert(rows.length == 8 && rows.head.getAs[String]("stage") == "corpus")
    assert(rows.head.getAs[Long]("docs_out") == 500L, "corpus row must count every doc")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("docs_in") == a.getAs[Long]("docs_out"),
        s"stage ${b.getAs[String]("stage")} docs_in must chain from the previous stage")
      assert(b.getAs[Long]("docs_out") <= b.getAs[Long]("docs_in"),
        s"a gate can only drop: $b")
      assert(b.getAs[Long]("tokens_out") <= a.getAs[Long]("tokens_out"),
        s"surviving tokens must be monotone: $b")
    }
    val dec = rows.find(_.getAs[String]("stage") == "decontam").get
    // the 20-doc eval slice is still present entering decontam and leaves
    // there by definition (plus any contaminated train doc)
    assert(dec.getAs[Long]("docs_in") - dec.getAs[Long]("docs_out") >= 1L,
      s"decontam must drop at least the surviving eval docs: $dec")
    assert(rows.last.getAs[Long]("docs_out") > 0L, "a usable train set must survive")
  }

  test("full-gate funnel: wider list chains and is a prefix-extension of the base funnel") {
    import spark.implicits._
    val base = ext.Pipeline.curationFunnel(
        Tables.documents(spark, "/root/testdata/sf0.001"))
      .orderBy($"stage_no").collect()
    val rows = ext.Pipeline.curationFunnelFull(
        Tables.documents(spark, "/root/testdata/sf0.001"))
      .orderBy($"stage_no").collect()
    assert(rows.length == 1 + ext.Pipeline.FunnelStagesFull.size)
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      "corpus" +: ext.Pipeline.FunnelStagesFull,
      "stage order must come from the shared Seq")
    // the shared prefix is bit-identical to the base funnel (same gates,
    // same order — the full list only APPENDS)
    rows.take(base.length).zip(base).foreach { case (f, b) =>
      assert(f == b, s"full funnel diverged from the base on shared stage: $f vs $b")
    }
    // chaining + monotonicity over the wider list
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("docs_in") == a.getAs[Long]("docs_out"),
        s"stage ${b.getAs[String]("stage")} docs_in must chain")
      assert(b.getAs[Long]("docs_out") <= b.getAs[Long]("docs_in"),
        s"a gate can only drop: $b")
      assert(b.getAs[Long]("tokens_out") <= a.getAs[Long]("tokens_out"),
        s"surviving tokens must be monotone: $b")
    }
    assert(rows.last.getAs[Long]("docs_out") > 0L, "a usable train set must survive")
  }

  test("funnel marginal: alone <= failing per gate, and saves are bounded by total drops") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m = ext.Pipeline.funnelMarginal(docs).orderBy($"stage_no").collect()
    assert(m.map(_.getAs[String]("stage")).toSeq == ext.Pipeline.FunnelStagesFull,
      "one row per full-set gate, in the shared Seq's order")
    m.foreach { r =>
      assert(r.getAs[Long]("docs_dropped_alone") <= r.getAs[Long]("docs_failing"),
        s"alone cannot exceed the gate's raw failure count: $r")
    }
    // every alone-dropped doc is a distinct dropped doc (it passes all
    // other gates, so it cannot be alone-dropped by two gates): the sum
    // is bounded by the corpus minus the full funnel's survivors
    val full = ext.Pipeline.curationFunnelFull(docs).orderBy($"stage_no").collect()
    val dropped = full.head.getAs[Long]("docs_out") - full.last.getAs[Long]("docs_out")
    assert(m.map(_.getAs[Long]("docs_dropped_alone")).sum <= dropped,
      "alone-drops must be disjoint and within total drops")
    assert(m.exists(_.getAs[Long]("docs_failing") > 0L),
      "fixture corpus must exercise at least one gate")
  }

  test("ingest audit: exact implies bloom (cross-modality FN law), attribution consistent") {
    import spark.implicits._
    val a = ext.Pipeline.ingestAudit(
      Tables.documents(spark, "/root/testdata/sf0.001")).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      // an exact duplicate's lines are ALL standing, so the line filter
      // must fire too — a false negative here is a broken Bloom family
      if (r.getAs[Long]("exact_dup") == 1L)
        assert(r.getAs[Long]("bloom_drop") == 1L,
          s"exact dup escaped the line filter: $r")
      val fired = r.getAs[Long]("exact_dup") + r.getAs[Long]("bloom_drop") +
        r.getAs[Long]("neardup_drop")
      assert((r.getAs[Long]("kept") == 1L) == (fired == 0L), s"kept flag: $r")
      val expected =
        if (r.getAs[Long]("exact_dup") == 1L) "exact"
        else if (r.getAs[Long]("bloom_drop") == 1L) "bloom"
        else if (r.getAs[Long]("neardup_drop") == 1L) "near_dup"
        else "kept"
      assert(r.getAs[String]("drop_stage") == expected, s"attribution order: $r")
    }
    assert(a.exists(_.getAs[Long]("kept") == 0L),
      "fixture corpus must drop at least one batch doc")
    assert(a.exists(_.getAs[Long]("kept") == 1L),
      "fixture corpus must keep at least one batch doc")
  }

  test("cell PSI: a mode-shifted batch scores higher drift than a same-distribution batch") {
    import spark.implicits._
    // two well-separated modes on dim 1; corpus alternates modes, so the
    // trained cells split them. Batch A continues alternating (same
    // distribution); batch B lands entirely in mode 1 (topic shift whose
    // PER-DIMENSION mean moves far less than its cell histogram).
    def vecs(ids: Seq[Long], mode: Long => Long) = ids.map { i =>
      (i, Seq.tabulate(8)(d =>
        (if (d == 0) (if (mode(i) == 0) -0.9f else 0.9f) else 0.01f * ((i + d) % 7))))
    }
    val corpus = vecs(0L until 360L, _ % 2)
    val same = vecs(360L until 400L, _ % 2)
    val shifted = vecs(360L until 400L, _ => 1L)
    def psiOf(batch: Seq[(Long, Seq[Float])]): Double =
      ext.Similarity.cellDrift((corpus ++ batch).toDF("vec_id", "embedding"))
        .collect()(0).getAs[Double]("psi")
    val psiSame = psiOf(same)
    val psiShift = psiOf(shifted)
    info(f"cell PSI same-dist=$psiSame%.4f mode-shifted=$psiShift%.4f")
    assert(psiShift > psiSame,
      f"mode shift must raise cell PSI: $psiShift%.4f <= $psiSame%.4f")
    assert(psiSame >= 0.0 && psiShift > 0.1,
      f"shifted batch must register substantial drift: $psiShift%.4f")
  }

  test("split-leak audit: a cluster straddling train and test is flagged; singletons excluded") {
    import spark.implicits._
    // md5('7:'||id) % 20 buckets: id 24 -> 19 (test), ids 1,2 -> train
    // (computed offline). Cluster {1, 24} straddles -> leak; cluster
    // {2, 3} is train-only -> no leak; singleton 5 emits no row.
    val groups = Seq((1L, 1L), (24L, 1L), (2L, 2L), (3L, 2L), (5L, 5L))
      .toDF("doc_id", "cluster_id")
    val docs = groups.select($"doc_id", lit("x y z").as("text"))
    val got = ext.Pipeline.splitLeakAudit(docs, groups0 = Some(groups))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("n_train"),
          r.getAs[Long]("n_test"), r.getAs[Long]("leak"))).toMap
    assert(got.keySet == Set(1L, 2L), s"only multi-member clusters emit rows: $got")
    assert(got(1L) == ((2L, 1L, 1L, 1L)), s"straddling cluster must flag leak: $got")
    assert(got(2L) == ((2L, 2L, 0L, 0L)), s"single-split cluster must not flag: $got")
    // corpus-wide law: leak = 1 exactly when more than one split is hit
    val bad = ext.Pipeline.splitLeakAudit(
        Tables.documents(spark, "/root/testdata/sf0.001"))
      .filter(($"leak" === 1L) =!=
        (greatest($"n_train", $"n_val", $"n_test") < $"n_members")).count()
    assert(bad == 0L, "leak flag must equal the more-than-one-split predicate")
  }

  test("packFit window dial: the wide window fills at least as well on the harness corpus") {
    import spark.implicits._
    val counts = Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id", "cast(size(split(text, ' ')) as bigint) as n_tokens")
    val r = ext.Pipeline.packFitWindowDial(counts).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("w_small") == 32L && row.getAs[Long]("w_large") == 256L)
    assert(row.getAs[Long]("fill_delta_e6") >= 0L,
      s"W=256 must fill at least as well as W=32 on real counts: $row")
    assert(row.getAs[Long]("n_bins_w_large") <= row.getAs[Long]("n_bins_w_small"),
      s"wider windows must not need MORE bins: $row")
  }

  test("cross-modal manifest: an image re-encode with unique text is dropped") {
    import spark.implicits._
    // two docs with UNIQUE texts that pass every text gate; the image
    // cluster frame says doc 2's image is a re-encode of doc 1's (same
    // cluster, non-canonical) — the text-only manifest keeps both, the
    // cross-modal gate drops doc 2
    def goodText(tag: String) =
      (1 to 12).map(i => s"${tag}word$i the of").mkString(" ") // 36 toks, stopwords
    val docs = Seq(
      (1L, goodText("a"), "en", "web"),
      (2L, goodText("b"), "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val imgGroups = Seq(
      (1L, 1L, 1L), (2L, 1L, 0L) // doc 2: same image cluster, not canonical
    ).toDF("doc_id", "cluster_id", "is_canonical")
    val old = ext.Pipeline.trainsetManifest(docs)
      .select($"doc_id", $"keep").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(old == Map(1L -> 1L, 2L -> 1L),
      s"both docs must pass the text-only gates: $old")
    val mm = ext.Pipeline.trainsetManifestMm(docs, imgGroups0 = Some(imgGroups))
      .select($"doc_id", $"img_ok", $"keep").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(mm(1L) == ((1L, 1L)), s"canonical image must stay kept: $mm")
    assert(mm(2L) == ((0L, 0L)),
      s"image re-encode with unique text must be dropped by the cross-modal gate: $mm")
  }

  test("image keep-best: resolution wins; bytes-per-pixel breaks area ties over min-id") {
    import spark.implicits._
    // cluster {1, 5}: doc 5 decodes LARGER than doc 1 — the quality key
    // must pick 5 where the min-id canonical (j5_phash_groups) picks 1.
    // cluster {20, 21}: EQUAL area, doc 21 carries more payload bytes
    // per pixel (least-compressed) — the round-15 production key must
    // pick 21 over the min-id 20.
    val groups = Seq((1L, 1L), (5L, 1L), (9L, 9L), (20L, 20L), (21L, 20L))
      .toDF("doc_id", "cluster_id")
    val decoded = Seq(
        (1L, 4L, 3L, 200L), (5L, 18L, 7L, 100L), (9L, 12L, 4L, 50L),
        (20L, 6L, 4L, 120L), (21L, 4L, 6L, 300L))
      .toDF("doc_id", "width", "height", "payload_bytes")
    val got = ext.Multimodal.keepBestImages(groups, decoded)
      .select($"doc_id", $"best_doc_id", $"kept_best").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((5L, 0L)) && got(5L) == ((5L, 1L)),
      s"highest pixel area must win within the cluster: $got")
    assert(got(9L) == ((9L, 1L)), s"singleton keeps itself: $got")
    assert(got(20L) == ((21L, 0L)) && got(21L) == ((21L, 1L)),
      s"equal area must fall to the least-compressed member: $got")
    // harness law: exactly one survivor per cluster
    val perCluster = ext.Multimodal.keepBestImages(
        ext.Dedup.ccGroupsConverged(
          Tables.documents(spark, "/root/testdata/sf0.001").select($"doc_id".as("v")),
          ext.Multimodal.aHashHammingPairs(ext.Multimodal.pngFixture(
            Tables.documents(spark, "/root/testdata/sf0.001"))).select($"doc_a", $"doc_b")),
        ext.Multimodal.decodeImages(ext.Multimodal.pngFixture(
          Tables.documents(spark, "/root/testdata/sf0.001"))))
      .groupBy($"cluster_id").agg(sum($"kept_best").as("nk"))
      .filter($"nk" =!= 1L).count()
    assert(perCluster == 0L, "every cluster must keep exactly one survivor")
  }

  test("scalable bloom: no false negatives across slice boundaries; slices honor geometric caps") {
    import spark.implicits._
    // 5 corpus docs x 2 distinct 5-token lines = 10 distinct lines;
    // cap0=4 gives geometric capacities 4/8/16..., so ranks 1-4 seal
    // slice 0 and ranks 5-10 sit in slice 1 (6 of its 8). The batch doc
    // repeats one line from the FIRST arrival (doc 1, slice 0) and one
    // from the LAST (doc 5, slice 1) plus a novel line — membership must
    // hit across the boundary from both slices, under each slice's OWN
    // (m, k), with zero false negatives.
    def lineOf(d: Int, j: Int) = (1 to 5).map(t => s"d${d}w$j$t").mkString(" ")
    val corpus = (1 to 5).map(d => (d.toLong, s"${lineOf(d, 0)} ${lineOf(d, 1)}"))
    val batch = Seq((10L, s"${lineOf(1, 0)} ${lineOf(5, 1)} novel one two three four"))
    val docs = (corpus ++ batch).toDF("doc_id", "text")
    val sl = ext.Dedup.bloomSliceLines(
      ext.Dedup.bloomDocLines(docs.filter($"doc_id" % 10 =!= 0)), cap0 = 4L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sl.values.toSet.size == 2, s"expected 2 slices, got ${sl.values.toSet}")
    assert(sl(lineOf(1, 0)) != sl(lineOf(5, 1)),
      "fixture must place the two probed duplicates in DIFFERENT slices")
    val probe = ext.Dedup.bloomScaleProbe(docs, cap0 = 4L).collect()
    assert(probe.length == 1)
    val r = probe.head
    assert(r.getAs[Long]("n_exact_dup") == 2L, s"expected 2 exact dups: $r")
    assert(r.getAs[Long]("n_false_neg") == 0L,
      s"sliced filter missed an inserted line across a slice boundary: $r")
    assert(r.getAs[Long]("n_bloom_dup") >= 2L, s"bloom must flag both dups: $r")
    val stats = ext.Dedup.bloomScaleStats(docs, cap0 = 4L).collect()
    assert(stats.length == 2, s"expected 2 slice rows: ${stats.mkString(";")}")
    assert(stats.map(_.getAs[Long]("n_lines")).sorted.toSeq == Seq(4L, 6L),
      s"slice admissions must honor the geometric caps: ${stats.mkString(";")}")
    // error tightening: k grows by 1 per slice from k0
    assert(stats.sortBy(_.getAs[Long]("slice_id")).map(_.getAs[Long]("k_hashes")).toSeq ==
      Seq(ext.Dedup.BloomSliceK0.toLong, ext.Dedup.BloomSliceK0 + 1L),
      s"k must grow per slice: ${stats.mkString(";")}")
    stats.foreach(s => assert(s.getAs[Long]("n_set_positions") <=
      s.getAs[Long]("n_lines") * s.getAs[Long]("k_hashes"),
      s"more positions than k*lines: $s"))
  }

  test("scalable bloom upsert: new lines fill the active slice's headroom then roll") {
    import spark.implicits._
    // same 2-slice corpus as the probe fixture (cap0=4 -> geometric caps
    // 4/8/16, 10 standing lines, so the active slice 1 has headroom 2);
    // the batch doc carries 1 member line + 3 novel lines -> novel
    // virtual ranks 11,12 land in slice 1, rank 13 opens slice 2 — the
    // Almeida insert discipline at batch grain
    def lineOf(d: Int, j: Int) = (1 to 5).map(t => s"d${d}w$j$t").mkString(" ")
    val corpus = (1 to 5).map(d => (d.toLong, s"${lineOf(d, 0)} ${lineOf(d, 1)}"))
    val novel = Seq("na1 na2 na3 na4 na5", "nb1 nb2 nb3 nb4 nb5", "nc1 nc2 nc3 nc4 nc5")
    val batch = Seq((10L, (lineOf(1, 0) +: novel).mkString(" ")))
    val docs = (corpus ++ batch).toDF("doc_id", "text")
    val asg = ext.Dedup.bloomScaleNewLineSlices(docs, cap0 = 4L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(asg == Map(novel(0) -> 1L, novel(1) -> 1L, novel(2) -> 2L),
      s"headroom-then-roll assignment violated: $asg")
    val up = ext.Dedup.bloomScaleUpsert(docs, cap0 = 4L)
    val standing = ext.Dedup.bloomSlicePositions(ext.Dedup.bloomSliceLines(
      ext.Dedup.bloomDocLines(docs.filter($"doc_id" % 10 =!= 0)), cap0 = 4L), cap0 = 4L).count()
    assert(up.filter($"is_new" === 0L).count() == standing,
      "standing rows must pass through unchanged")
    val newSlices = up.filter($"is_new" === 1L)
      .select($"slice").distinct().collect().map(_.getLong(0)).toSet
    assert(newSlices == Set(1L, 2L), s"inserts must land in slices 1 and 2: $newSlices")
    // the member line contributed nothing: at most 2 lines x k1=9 + 1 x k2=10
    assert(up.filter($"is_new" === 1L).count() <= 28L)
  }

  test("scalable bloom on the harness corpus: per-slice fill below the design point") {
    import spark.implicits._
    // corpus-wide law at real data: exact dups are never missed, and no
    // slice's fill exceeds the ~50%-at-cap design point by construction
    val probe = ext.Dedup.bloomScaleProbe(
        Tables.documents(spark, "/root/testdata/sf0.001"))
      .agg(sum($"n_false_neg").as("fn"), sum($"n_exact_dup").as("ex")).collect()(0)
    assert(probe.getLong(0) == 0L, "sliced filter produced a false negative")
    assert(probe.getLong(1) > 0L, "fixture corpus must carry exact dups")
    val fills = ext.Dedup.bloomScaleStats(
        Tables.documents(spark, "/root/testdata/sf0.001"))
      .select($"fill_e6").collect().map(_.getLong(0))
    assert(fills.nonEmpty)
    // per-slice sizing (m >= k*cap/ln2) bounds fill at cap to 50%; a
    // healthy rounding margin for the assert
    fills.foreach(f => assert(f <= 520000L, s"slice fill $f above the design point"))
  }

  test("bloom FPR-bound convention: measured within the model, model within budget, both families") {
    import spark.implicits._
    // The round-14 lesson: a deterministic-hash oracle reproduces WRONG
    // verdicts, so fitness-for-purpose needs its own pin. Every
    // probabilistic membership op carries an in-query model-vs-measured
    // row; this test is the spec'd ceiling on BOTH Bloom families at the
    // harness corpus: measured FPR <= 3x predicted + 0.2% absolute
    // sampling slack, and (sliced family) the predicted COMPOUND error
    // inside the all-slices-full worst case of the power-of-two sizing
    // (~1307 e6 folding expected fill 1-e^(-k*cap/m) at capacity through
    // every dial row — far under the telescoped 2^(1-k0) = 7812 e6
    // analytic budget; 1400 leaves fill-fluctuation room) with zero
    // false negatives. ScaleProbe asserts the same bound at 10x/30x.
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def fprBound(name: String, predicted: Long, measured: Long): Unit =
      assert(measured <= 3 * predicted + 2000,
        s"$name: measured FPR $measured blew past the model $predicted (e6)")
    val fixed = ext.Dedup.bloomStats(docs).collect()(0)
    fprBound("fixed bloom",
      fixed.getAs[Long]("predicted_fpr_e6"), fixed.getAs[Long]("measured_fpr_e6"))
    val sliced = ext.Dedup.bloomScaleStatsCompound(docs).collect()(0)
    fprBound("sliced bloom",
      sliced.getAs[Long]("predicted_fpr_e6"), sliced.getAs[Long]("measured_fpr_e6"))
    assert(sliced.getAs[Long]("predicted_fpr_e6") <= 1400L,
      s"sliced compound model outside the all-slices-full worst case: $sliced")
    assert(sliced.getAs[Long]("n_false_neg") == 0L, s"sliced false negatives: $sliced")
    // count identity at the compound grain
    assert(sliced.getAs[Long]("n_bloom_hits") ==
      sliced.getAs[Long]("n_exact_dups") + sliced.getAs[Long]("n_false_pos")
        - sliced.getAs[Long]("n_false_neg"),
      s"compound count identity violated: $sliced")
    // NEGATIVE CONTROL (the j4_bpe_decode corrupted-table convention —
    // prove the tripwire can FIRE): at the degenerate k0 = 1 dial the
    // telescoped budget is 2^0 = 100% and slices saturate their error —
    // the same chain must MEASURE a large FPR on the same corpus, and
    // the in-row model must track it (a model that stays green while
    // measurement explodes is exactly the round-14 failure shape).
    val bad = ext.Dedup.bloomScaleStatsCompound(docs, cap0 = 100L, k0 = 1)
      .collect()(0)
    val badMeas = bad.getAs[Long]("measured_fpr_e6")
    val badPred = bad.getAs[Long]("predicted_fpr_e6")
    assert(badMeas > 50000L,
      s"degenerate dial must measure a large FPR (tripwire fires): $bad")
    assert(badMeas <= 3 * badPred + 2000 && badPred <= 3 * badMeas + 2000,
      s"model must track measurement even in the bad regime: $bad")
    assert(badMeas > 20L * math.max(sliced.getAs[Long]("measured_fpr_e6"), 1L),
      s"healthy dial must beat the degenerate one by >20x: healthy=$sliced bad=$bad")
  }

  test("lsh recall row: truth non-empty, counts consistent, high-recall dial dominates") {
    import spark.implicits._
    val r = ext.Dedup.lshRecall(Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect().map(x => x.getAs[String]("config") -> x).toMap
    val d = r("default"); val h = r("b4r1")
    assert(d.getAs[Long]("n_truth") > 0L, "exact ground truth must be non-empty")
    Seq(d, h).foreach { x =>
      assert(x.getAs[Long]("n_hit") <= x.getAs[Long]("n_truth"), s"hits exceed truth: $x")
      assert(x.getAs[Long]("n_hit") <= x.getAs[Long]("n_cand"), s"hits exceed candidates: $x")
      assert(x.getAs[Long]("precision_e6") <= 1000000L && x.getAs[Long]("recall_e6") <= 1000000L)
    }
    // P(candidate) = 1-(1-j)^4 >= 1-(1-j^2)^2 pointwise, and the 4x1
    // layout's candidate set is a SUPERSET of 2x2's only stochastically —
    // the graded pin is the round-15 verdict's: the high-recall dial's
    // measured recall must dominate the default's.
    assert(h.getAs[Long]("recall_e6") >= d.getAs[Long]("recall_e6"),
      s"high-recall dial must dominate the default: b4r1=$h default=$d")
    graft.Pinned.release(spark)
  }

  test("bloom upsert2: standing preserved, no cross-boundary false negative, capacity law") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val up2 = ext.Dedup.bloomScaleUpsert2(docs)
    val sl0 = ext.Dedup.bloomSliceLines(
      ext.Dedup.bloomDocLines(docs.filter($"doc_id" % 10 =!= 0)))
    val b1 = ext.Dedup.bloomDocLines(docs.filter($"doc_id" % 20 === 10L))
    val ns1 = ext.Dedup.bloomScaleIngestNewSlices(sl0, b1)
    val sl1 = sl0.select($"line", $"slice").unionByName(ns1)
    val b2 = ext.Dedup.bloomDocLines(docs.filter($"doc_id" % 20 === 0L))
    val ns2 = ext.Dedup.bloomScaleIngestNewSlices(sl1, b2)
    // the two halves genuinely both ingest on the fixture
    assert(b1.count() > 0 && b2.count() > 0, "both batch halves must be non-empty")
    // (a) batch_no = 0 rows ARE the standing position set, untouched
    val standing = ext.Dedup.bloomSlicePositions(sl0)
    val got0 = up2.filter($"batch_no" === 0L).select($"slice", $"p")
    assert(got0.exceptAll(standing).count() == 0 &&
      standing.exceptAll(got0).count() == 0, "standing state must be preserved exactly")
    // (b) composition law across the ingest boundary: a batch-2 line that
    // duplicates ANY v1 line (corpus or batch-1 insert) is a member and
    // must never re-insert — the construction's no-false-negative
    // guarantee extended over the boundary
    assert(ns2.join(sl1, Seq("line"), "left_semi").count() == 0,
      "batch-2 inserted a line already standing in v1")
    // (c) rank continuation keeps every slice within its dial capacity
    // after BOTH ingests
    val over = sl1.unionByName(ns2).groupBy($"slice").agg(count(lit(1)).as("n"))
      .join(ext.Dedup.bloomParamsDf(spark), Seq("slice"))
      .filter($"n" > $"hi" - $"lo")
    assert(over.count() == 0, "a slice was filled past its dial capacity")
    // (d) the three batch_no strata partition the position set
    assert(up2.groupBy($"slice", $"p").count().filter($"count" > 1).count() == 0,
      "a position appeared in more than one stratum")
    graft.Pinned.release(spark)
  }

  test("bloom state-table probe: row-identical to the recompute form") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val re = asSet(ext.Dedup.bloomScaleProbe(docs))
    val st = asSet(ext.Dedup.bloomScaleProbeState(spark,
      "extspec_bloomstate", docs))
    assert(re == st, "persisted (line, slice) state diverged from the in-query build")
    graft.Pinned.release(spark)
  }

  test("incremental upsert2: batch-2 near-dup of a batch-1-kept doc caught across the boundary") {
    import spark.implicits._
    // corpus 1..9 unique; batch 1 (% 20 == 10): doc 10 novel -> kept and
    // INDEXED; batch 2 (% 20 == 0): doc 20 = doc 10 with only the last
    // token changed (39 of 41 shingles shared, J ~ 0.95 >= 0.9) -> must
    // DROP against the v1 index (the cross-boundary composition the
    // single-step upsert cannot express), doc 40 novel -> kept.
    def mk(p: String, n: Int = 40) = (1 to n).map(i => s"$p$i").mkString(" ")
    val docs = ((1 to 9).map(d => (d.toLong, mk(s"c$d"))) ++
      Seq((10L, mk("x")),
        (20L, (1 to 39).map(i => s"x$i").mkString(" ") + " q40"),
        (40L, mk("z")))).toDF("doc_id", "text")
    val up = ext.Dedup.incrementalNearDupUpsert2(docs)
    val perDoc = up.groupBy($"doc_id")
      .agg(max($"batch_no").as("bn"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc.get(10L).contains(1L), s"batch-1 kept doc must be indexed: $perDoc")
    assert(!perDoc.contains(20L),
      s"batch-2 near-dup of the batch-1 insert must be dropped: $perDoc")
    assert(perDoc.get(40L).contains(2L), s"batch-2 novel doc must be indexed: $perDoc")
    assert((1L to 9L).forall(d => perDoc.get(d).contains(0L)),
      s"standing corpus rows must pass through: $perDoc")
    graft.Pinned.release(spark)
  }

  test("semdedup upsert2: batch-2 vector near a batch-1 insert dropped across the boundary") {
    import spark.implicits._
    // orthogonal one-hot corpus (dims 0..7, ids 0..89) so cross-direction
    // cosines are exactly 0; batch 1 = ids 90..94 on unique dims (all
    // kept and INDEXED); batch 2 = ids 95..99 where vec 95 == vec 90
    // (cos 1e6 >= the 350000 threshold -> must drop against the batch-1
    // insert, the cross-boundary law) and the rest are unique (kept).
    val dim = 16
    def oneHot(d: Int): Seq[Float] = (0 until dim).map(i => if (i == d) 1f else 0f)
    val rows = (0 until 90).map(id => (id.toLong, oneHot(id % 8))) ++ Seq(
      90L -> oneHot(9), 91L -> oneHot(11), 92L -> oneHot(12),
      93L -> oneHot(13), 94L -> oneHot(14),
      95L -> oneHot(9), 96L -> oneHot(10), 97L -> oneHot(15),
      98L -> oneHot(8), 99L -> (0 until dim).map(i => if (i == 8 || i == 15) 1f else 0f))
    val emb = rows.toDF("vec_id", "embedding")
    val up = Similarity.semDedupIncrementalUpsert2(spark, "extspec_sem_upsert2", emb)
    val byBatch = up.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byBatch.get(90L).contains(1L), s"batch-1 unique vector must be indexed: $byBatch")
    assert(!byBatch.contains(95L),
      s"batch-2 duplicate of the batch-1 insert must be dropped: $byBatch")
    assert(Seq(96L, 97L, 98L).forall(v => byBatch.get(v).contains(2L)),
      s"unique batch-2 vectors must be kept: $byBatch")
    assert(byBatch.exists(_._2 == 0L), "standing members must pass through")
    graft.Pinned.release(spark)
  }

  test("ingest upsert2: any modality's near-miss of a batch-1 insert drops across the boundary") {
    import spark.implicits._
    // corpus 1..9 unique; batch 1 (% 20 == 10): doc 10 novel -> composed
    // keep, advances ALL THREE states. batch 2 (% 20 == 0):
    //   doc 20 = EXACT copy of doc 10        -> exact gate vs v1 hashes
    //   doc 40 = doc 10's 5-token LINE BLOCKS in reverse order (same
    //            line SET, different text)   -> sliced-Bloom gate vs v1
    //   doc 60 = novel                       -> kept, batch_no = 2
    def mk(p: String, n: Int = 40) = (1 to n).map(i => s"$p$i").mkString(" ")
    val xToks = (1 to 40).map(i => s"x$i")
    val xRevLines = xToks.grouped(ext.Dedup.LineTokens).toSeq.reverse.flatten.mkString(" ")
    val docs = ((1 to 9).map(d => (d.toLong, mk(s"c$d"))) ++ Seq(
      (10L, xToks.mkString(" ")),
      (20L, xToks.mkString(" ")),
      (40L, xRevLines),
      (60L, mk("z")))).toDF("doc_id", "text")
    val up = ext.Pipeline.ingestUpsert2(docs)
    val members = up.filter($"family" === "member")
      .collect().map(r => r.getLong(1) -> r.getLong(5)).toMap
    assert(members.get(10L).contains(1L), s"batch-1 novel doc must be kept: $members")
    assert(!members.contains(20L),
      s"exact copy of the batch-1 insert must drop at the v1 exact gate: $members")
    assert(!members.contains(40L),
      s"line-permuted copy must drop at the v1 sliced-Bloom gate: $members")
    assert(members.get(60L).contains(2L), s"batch-2 novel doc must be kept: $members")
    // the dropped docs entered NO state in any family
    val newKeyed = up.filter($"family" =!= "bloom" && $"batch_no" > 0L)
      .select($"k1").as[Long].collect().toSet
    assert(!newKeyed.contains(20L) && !newKeyed.contains(40L),
      "a dropped doc's rows entered the lsh/member state")
    // bloom: batch-2 contributed only doc 60's novel lines (doc 40's
    // lines are all members of v1 and never re-insert)
    val b2pos = up.filter($"family" === "bloom" && $"batch_no" === 2L).count()
    assert(b2pos > 0L, "batch-2 novel doc must insert lines")
    graft.Pinned.release(spark)
  }

  test("ingest upsert: a doc dropped by ANY gate enters NO standing state") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val audit = ext.Pipeline.ingestAudit(docs)
    val kept = audit.filter($"kept" === 1L).select($"doc_id").as[Long].collect().toSet
    val dropped = audit.filter($"kept" === 0L).select($"doc_id").as[Long].collect().toSet
    assert(dropped.nonEmpty, "fixture batch must exercise the drop path")
    assert(kept.nonEmpty, "fixture batch must exercise the keep path")
    val up = ext.Pipeline.ingestUpsert(docs)
    // membership roster == the audit's kept set, exactly
    val memNew = up.filter($"family" === "member" && $"is_new" === 1L)
      .select($"k1").as[Long].collect().toSet
    assert(memNew == kept, s"membership roster diverged from the audit keep set")
    // lsh: only kept docs' band rows enter the index
    val lshNew = up.filter($"family" === "lsh" && $"is_new" === 1L)
      .select($"k1").as[Long].collect().toSet
    assert(lshNew.subsetOf(kept) && (lshNew & dropped).isEmpty,
      s"a dropped doc's band rows entered the LSH index")
    // bloom: every inserted line originates from a kept doc, and the
    // is_new positions are exactly those lines' novel positions
    val keptDf = audit.filter($"kept" === 1L).select($"doc_id")
    val sl0 = ext.Dedup.bloomSliceLines(
      ext.Dedup.bloomDocLines(docs.filter($"doc_id" % 10 =!= 0)))
    val batch = ext.Dedup.bloomDocLines(docs.filter($"doc_id" % 10 === 0))
    val ns = ext.Dedup.bloomScaleIngestNewSlices(sl0, batch, keptDocs0 = Some(keptDf))
    assert(ns.join(batch.join(keptDf, Seq("doc_id"), "left_semi")
        .select($"line").distinct(), Seq("line"), "left_anti").count() == 0,
      "an inserted bloom line did not come from a kept doc")
    val standing = ext.Dedup.bloomSlicePositions(sl0)
    val expected = ext.Dedup.bloomSlicePositions(ns)
      .join(standing, Seq("slice", "p"), "left_anti")
    val gotB = up.filter($"family" === "bloom" && $"is_new" === 1L)
      .select($"k1".as("slice"), $"k2".as("p"))
    assert(gotB.exceptAll(expected).count() == 0 &&
      expected.exceptAll(gotB).count() == 0,
      "bloom is_new positions diverged from the composed-keep insert set")
    graft.Pinned.release(spark)
  }

  test("ingest state audit: row-identical to the recompute audit (persisted composed state cannot drift)") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = ext.Pipeline.ingestAudit(docs)
    val s = ext.Pipeline.ingestAuditState(spark, "/root/testdata/sf0.001", docs)
    assert(s.exceptAll(a).count() == 0 && a.exceptAll(s).count() == 0,
      "state-table audit diverged from the recompute audit")
    graft.Pinned.release(spark)
  }

  test("five-gate audit: attribution order, sem self-exclusion, both new gates fire on the harness") {
    import spark.implicits._
    val key = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, key)
    val emb = Tables.embeddings(spark, key)
    val sem = ext.Similarity.semGateVerdicts(spark, key, emb,
      emb.filter($"vec_id" % 10 === 0).select($"vec_id"))
    val img = ext.Dedup.ccGroupsConverged(docs.select($"doc_id".as("v")),
      ext.Multimodal.aHashHammingPairs(ext.Multimodal.pngFixture(docs))
        .select($"doc_a", $"doc_b"))
    val a = ext.Pipeline.ingestAuditMm(docs, sem, img).collect()
    assert(a.length == 50, "one row per batch doc")
    a.foreach { r =>
      val gates = Seq("exact_dup", "bloom_drop", "neardup_drop", "sem_drop",
        "img_drop").map(r.getAs[Long])
      assert((r.getAs[Long]("kept") == 1L) == (gates.sum == 0L), s"kept flag: $r")
      val expected = Seq("exact", "bloom", "near_dup", "semantic", "image")
        .zip(gates).collectFirst { case (nm, 1L) => nm }.getOrElse("kept")
      assert(r.getAs[String]("drop_stage") == expected, s"attribution order: $r")
      // self-exclusion: the sem gate never matches the doc's own vector
      assert(r.getAs[Long]("sem_match") != r.getAs[Long]("doc_id"),
        s"sem gate matched itself: $r")
    }
    // the three lexical columns are EXACTLY the three-gate audit's
    val lex3 = ext.Pipeline.ingestAudit(docs)
      .select($"doc_id", $"exact_dup", $"bloom_drop", $"neardup_drop")
    val lexMm = ext.Pipeline.ingestAuditMm(docs, sem, img)
      .select($"doc_id", $"exact_dup", $"bloom_drop", $"neardup_drop")
    assert(lexMm.exceptAll(lex3).count() == 0 && lex3.exceptAll(lexMm).count() == 0,
      "widening to five gates changed a lexical verdict")
    // the two NEW gates both differentiate on the harness corpus
    assert(a.exists(_.getAs[String]("drop_stage") == "semantic"),
      "fixture corpus must drop at least one doc at the semantic gate")
    assert(a.exists(_.getAs[String]("drop_stage") == "image"),
      "fixture corpus must drop at least one doc at the image gate")
    assert(a.exists(_.getAs[Long]("kept") == 1L), "some batch doc must survive all five")
    graft.Pinned.release(spark)
  }

  test("five-gate upsert: a doc dropped by ANY gate enters NO state in ANY family, sem included") {
    import spark.implicits._
    val key = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, key)
    val emb = Tables.embeddings(spark, key)
    val sem = ext.Similarity.semGateVerdicts(spark, key, emb,
      emb.filter($"vec_id" % 10 === 0).select($"vec_id"))
    val img = ext.Dedup.ccGroupsConverged(docs.select($"doc_id".as("v")),
      ext.Multimodal.aHashHammingPairs(ext.Multimodal.pngFixture(docs))
        .select($"doc_a", $"doc_b"))
    val audit = ext.Pipeline.ingestAuditMm(docs, sem, img)
    val kept = audit.filter($"kept" === 1L).select($"doc_id").as[Long].collect().toSet
    val dropped = audit.filter($"kept" === 0L).select($"doc_id").as[Long].collect().toSet
    assert(kept.nonEmpty && dropped.nonEmpty, "fixture must exercise both paths")
    // at least one doc passes the three lexical gates but is dropped by a
    // NEW gate — the docs the three-gate upsert would have (wrongly) written
    val lexOnly = audit.filter($"exact_dup" === 0L && $"bloom_drop" === 0L &&
      $"neardup_drop" === 0L && $"kept" === 0L).count()
    assert(lexOnly > 0L, "a sem/image drop must bite beyond the lexical gates")
    val keptM = ext.Similarity.semStateTables(spark, key, emb)(1)
    val up = ext.Pipeline.ingestUpsertMm(docs, keptM, sem, img)
    val memNew = up.filter($"family" === "member" && $"is_new" === 1L)
      .select($"k1").as[Long].collect().toSet
    assert(memNew == kept, "membership roster diverged from the five-gate keep")
    val lshNew = up.filter($"family" === "lsh" && $"is_new" === 1L)
      .select($"k1").as[Long].collect().toSet
    assert(lshNew.subsetOf(kept) && (lshNew & dropped).isEmpty,
      "a five-gate-dropped doc's band rows entered the LSH index")
    // the sem member index: exactly the kept docs (every doc has a vector)
    val semNew = up.filter($"family" === "sem" && $"is_new" === 1L)
      .select($"k1").as[Long].collect().toSet
    assert(semNew == kept, "sem member index diverged from the five-gate keep")
    // bloom: inserted lines originate from five-gate-kept docs only
    val keptDf = audit.filter($"kept" === 1L).select($"doc_id")
    val sl0 = ext.Dedup.bloomSliceLines(
      ext.Dedup.bloomDocLines(docs.filter($"doc_id" % 10 =!= 0)))
    val batch = ext.Dedup.bloomDocLines(docs.filter($"doc_id" % 10 === 0))
    val standing = ext.Dedup.bloomSlicePositions(sl0)
    val expected = ext.Dedup.bloomSlicePositions(
        ext.Dedup.bloomScaleIngestNewSlices(sl0, batch, keptDocs0 = Some(keptDf)))
      .join(standing, Seq("slice", "p"), "left_anti")
    val gotB = up.filter($"family" === "bloom" && $"is_new" === 1L)
      .select($"k1".as("slice"), $"k2".as("p"))
    assert(gotB.exceptAll(expected).count() == 0 &&
      expected.exceptAll(gotB).count() == 0,
      "bloom is_new positions diverged from the five-gate insert set")
    graft.Pinned.release(spark)
  }

  test("ingest state2: the persisted-v1 audit agrees with the in-query two-night loop about night 2") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a2 = ext.Pipeline.ingestAuditState2(spark, "/root/testdata/sf0.001", docs)
    val kept2 = a2.filter($"kept" === 1L).select($"doc_id").as[Long].collect().toSet
    val loopKept2 = ext.Pipeline.ingestUpsert2(docs)
      .filter($"family" === "member" && $"batch_no" === 2L)
      .select($"k1").as[Long].collect().toSet
    assert(kept2 == loopKept2,
      s"persisted-v1 audit and the in-query loop disagree about night 2: $kept2 vs $loopKept2")
    assert(a2.count() == docs.filter($"doc_id" % 20 === 0).count(),
      "one audit row per night-2 batch doc")
    assert(kept2.nonEmpty && a2.filter($"kept" === 0L).count() > 0,
      "night 2 must exercise both keep and drop paths")
    graft.Pinned.release(spark)
  }

  test("retract: removed doc absent from every family, next-best promoted, bloom rebuilt zero-FN") {
    import spark.implicits._
    // corpus ids 1..9 + 36 (36 % 25 == 11 — the takedown). Doc 36 shares
    // its FIRST line block with doc 1 (that line must SURVIVE the bloom
    // rebuild — another doc still carries it) and has a unique second
    // block (retired). Image cluster {4, 36}: 36 is the standing winner
    // (largest decoded area) — after the takedown, 4 must be promoted.
    val w = ext.Dedup.LineTokens
    def blk(p: String) = (1 to w).map(i => s"$p$i").mkString(" ")
    val shared = blk("sh")
    val docs = ((1 to 9).map(d => (d.toLong,
        if (d == 1) s"$shared ${blk("a")}"
        else (1 to 2 * w).map(i => s"c$d-$i").mkString(" ")))
      :+ (36L -> s"$shared ${blk("u")}")).toDF("doc_id", "text")
    val imgGroups = (Seq((4L, 4L), (36L, 4L)) ++
      Seq(1L, 2L, 3L, 5L, 6L, 7L, 8L, 9L).map(d => (d, d)))
      .toDF("doc_id", "cluster_id")
    val decoded = ((1 to 9).map(d => (d.toLong, 2L, 2L, 16L))
      :+ ((36L, 10L, 10L, 400L)))
      .toDF("doc_id", "width", "height", "payload_bytes")
    val semKeptM = Seq((1L, 0L), (4L, 1L), (36L, 0L)).toDF("mid", "cid")
    // standing election first: 36 IS the winner of cluster 4 pre-takedown
    val pre = ext.Multimodal.keepBestImages(imgGroups, decoded)
      .filter($"cluster_id" === 4L).select($"best_doc_id").distinct().collect()
    assert(pre.map(_.getLong(0)).toSeq == Seq(36L), "fixture: 36 must win pre-takedown")
    val out = ext.Pipeline.retract(docs, imgGroups, decoded, semKeptM)
    val mem = out.filter($"family" === "member").select($"k1").as[Long].collect().toSet
    assert(mem == (1L to 9L).toSet, s"member roster must lose exactly 36: $mem")
    val lsh = out.filter($"family" === "lsh").select($"k1").as[Long].collect().toSet
    assert(lsh.nonEmpty && !lsh.contains(36L), s"36's band rows must be retracted: $lsh")
    val sem = out.filter($"family" === "sem").select($"k1").as[Long].collect().toSet
    assert(sem == Set(1L, 4L), s"36's kept-member row must be retracted: $sem")
    // next-best promoted in the affected cluster; singletons keep themselves
    val img = out.filter($"family" === "img")
      .select($"k1", $"k2").as[(Long, Long)].collect().toMap
    assert(img(4L) == 4L, s"cluster 4 must promote its next-best member: $img")
    assert(img(2L) == 2L && !img.values.toSet.contains(36L),
      s"no removed doc may remain elected: $img")
    // bloom rebuild: zero FN on surviving lines; 36's unique line retired
    val rebuilt = out.filter($"family" === "bloom")
      .select($"k1".as("slice"), $"k2".as("p"))
    val survLines = ext.Dedup.bloomDocLines(docs.filter($"doc_id" =!= 36L))
    val members = ext.Dedup.bloomScaleMembers(survLines, rebuilt,
      ext.Dedup.BloomSliceCap0)
    assert(members.count() == survLines.distinct().count(),
      "rebuilt filter has a false negative on a surviving line")
    val probe36 = ext.Dedup.bloomScaleMembers(
      ext.Dedup.bloomDocLines(docs.filter($"doc_id" === 36L)), rebuilt,
      ext.Dedup.BloomSliceCap0).select($"line").as[String].collect().toSet
    assert(probe36.contains(shared), "the line a surviving doc carries must stay")
    assert(probe36.size == 1, s"36's unique line must be retired: $probe36")
    graft.Pinned.release(spark)
  }

  test("semdedup retrain: the crafted mode shift gets its own cell — the frozen quantizer provably cannot") {
    import spark.implicits._
    // 16-dim fixture: 36 standing vectors in 6 modes x 6 slots
    // (0.5 e_mode + 0.87 e_{6+slot} — within-cell pairwise cos 0.25, under
    // the 0.35 dedup radius, so ALL survive and the kept id space is
    // dense), except id 25 = the faint PRECURSOR of the new mode
    // (0.1 e14 + 0.995 e15). Batch (ids 36..39) = the new mode, pure e14:
    // orthogonal to every frozen centroid, so the frozen quantizer can
    // only file it into an old cell shared with standing members. The
    // retrain's stride seeding over the dense population picks id 25 as a
    // seed; the C members' only positive affinity is that seed, Lloyd
    // pulls its centroid onto e14, and the mode ends in ITS OWN cell:
    // exactly {25, 36, 37, 38, 39}.
    def v(parts: (Int, Double)*): Seq[Float] = {
      val a = Array.fill(16)(0.0f)
      parts.foreach { case (d, x) => a(d) = x.toFloat }
      a.toSeq
    }
    val emb = ((0 until 36).map { i =>
      if (i == 25) 25L -> v(14 -> 0.1, 15 -> 0.995)
      else i.toLong -> v((i / 6) -> 0.5, (6 + i % 6) -> 0.87)
    } ++ (36 until 40).map(i => i.toLong -> v(14 -> 1.0)))
      .toDF("vec_id", "embedding")
    val out = ext.Similarity.semDedupRetrain(spark,
      "fixture-retrain-modeshift", emb).collect()
    assert(out.length == 40, s"population must be dense: ${out.length}")
    val byId = out.map(r => r.getLong(0) ->
      (r.getAs[Long]("old_cell"), r.getAs[Long]("new_cell"))).toMap
    val cNew = (36L to 39L).map(byId(_)._2).toSet
    assert(cNew.size == 1, s"the new mode must land in ONE retrained cell: $cNew")
    val modeCell = out.filter(_.getAs[Long]("new_cell") == cNew.head)
      .map(_.getLong(0)).toSet
    assert(modeCell == Set(25L, 36L, 37L, 38L, 39L),
      s"the retrained cell must be the mode + its precursor, nothing else: $modeCell")
    // the frozen assignment filed the mode into a cell with ORTHOGONAL
    // standing members — the drift the frozen quantizer cannot resolve
    val cOld = (36L to 39L).map(byId(_)._1).toSet
    assert(cOld.size == 1, s"frozen assignment is deterministic: $cOld")
    val oldMates = out.filter(r => r.getAs[Long]("old_cell") == cOld.head)
      .map(_.getLong(0)).toSet -- Set(25L, 36L, 37L, 38L, 39L)
    assert(oldMates.nonEmpty,
      "the frozen cell must mix the new mode with orthogonal standing members")
    assert((36L to 39L).forall(id => byId(id)._1 != byId(id)._2),
      "the mode members must MOVE at retrain")
    graft.Pinned.release(spark)
  }

  test("pack_mm: spans adjacent, whole docs never straddle, image-canonical gate enforced") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val decoded = ext.Multimodal.decodeImages(ext.Multimodal.pngFixture(docs))
    val groups = ext.Dedup.ccGroupsConverged(docs.select($"doc_id".as("v")),
      ext.Multimodal.aHashHammingPairs(ext.Multimodal.pngFixture(docs))
        .select($"doc_a", $"doc_b"))
    val pmf = ext.Pipeline.packMm(docs, decoded, groups)
    val L = ext.Pipeline.PackSeqLen
    // span accounting: image placeholders directly after the text span,
    // and the item cost is exactly the two spans
    assert(pmf.filter($"img_offset" =!= $"seq_offset" + $"n_text_tokens").count() == 0)
    assert(pmf.filter($"n_tokens" =!= $"n_text_tokens" + $"n_img_tokens").count() == 0)
    // no straddle: a doc past the bin boundary is only legal alone in its
    // own oversize bin (the packFit convention)
    assert(pmf.filter($"seq_offset" + $"n_tokens" > L &&
      $"bin_tokens" =!= $"n_tokens").count() == 0, "a packed doc straddles its bin")
    // per-bin splice-back: spans tile the bin (sum == bin_tokens, sorted
    // spans never overlap)
    val spans = pmf.groupBy($"seq_id")
      .agg(sort_array(collect_list(struct($"seq_offset", $"n_tokens"))).as("sp"),
        sum($"n_tokens").as("s"), first($"bin_tokens").as("bt"))
      .withColumn("overlap", when(size($"sp") < 2, lit(false)).otherwise(expr(
        "exists(sequence(1, size(sp) - 1), " +
          "i -> sp[i-1].seq_offset + sp[i-1].n_tokens > sp[i].seq_offset)")))
    assert(spans.filter($"overlap" || $"s" =!= $"bt").count() == 0,
      "bin spans overlap or do not account for the bin fill")
    // the image gate: every packed doc is its image cluster's canonical,
    // and the fixture genuinely exercises the gate
    val canon = groups.filter($"doc_id" === $"cluster_id").select($"doc_id")
    val nonCanon = groups.filter($"doc_id" =!= $"cluster_id").select($"doc_id")
    assert(nonCanon.count() > 0, "fixture must carry non-canonical images")
    assert(pmf.join(canon, Seq("doc_id"), "left_anti").count() == 0 &&
      pmf.join(nonCanon, Seq("doc_id"), "left_semi").count() == 0,
      "a non-canonical-image doc was packed")
    graft.Pinned.release(spark)
  }

  test("IVF ANN: recall vs brute force is usable at 16 cells / 4 probes") {
    import spark.implicits._
    // deterministic pseudo-random corpus (hash-derived floats)
    val emb = spark.range(0L, 500L).select($"id".as("vec_id"),
      transform(sequence(lit(1), lit(16)),
        i => (pmod(xxhash64($"id" * 1000 + i), lit(2001)) - 1000).cast("float") / 1000f)
        .as("embedding"))
    val exact = Similarity.knnCosine(emb, nQueries = 10, k = 3)
      .select($"qid", $"vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val s = df.select($"qid", $"vid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & s).size.toDouble / exact.size
    }
    val seedRecall = recallOf(Similarity.annIvf(emb, nQueries = 10, k = 3, iters = 0))
    val recall = recallOf(Similarity.annIvf(emb, nQueries = 10, k = 3))
    val lshRecall = recallOf(Similarity.annLsh(emb, nQueries = 10, k = 3))
    val np1Recall = recallOf(Similarity.annIvf(emb, nQueries = 10, k = 3, nProbes = 1))
    info(f"IVF recall@3 over 10 queries: seed=$seedRecall%.2f lloyd=$recall%.2f lsh=$lshRecall%.2f nprobe1=$np1Recall%.2f")
    assert(recall >= 0.2, s"IVF recall collapsed: $recall")
    // the Lloyd rounds are the point (round-5 verdict stretch): refined
    // centroids must not trail the un-refined seed, and must at least match
    // the LSH path's recall on the same corpus and query set
    assert(recall >= seedRecall, s"Lloyd refinement lost recall: $recall < $seedRecall")
    assert(recall >= lshRecall, s"refined IVF trails LSH: $recall < $lshRecall")
    // the probe dial is the point of multi-probe (round-10 verdict #4):
    // 4 probed cells must not trail 1 — recall is bought with nprobe
    assert(recall >= np1Recall, s"multi-probe trails single-probe: $recall < $np1Recall")
  }

  test("ann recall: graded per-query recall matches the set-overlap definition") {
    import spark.implicits._
    // same deterministic pseudo-random corpus as the IVF spec
    val emb = spark.range(0L, 500L).select($"id".as("vec_id"),
      transform(sequence(lit(1), lit(16)),
        i => (pmod(xxhash64($"id" * 1000 + i), lit(2001)) - 1000).cast("float") / 1000f)
        .as("embedding"))
    val r = Similarity.annRecall(emb, nQueries = 10, k = 3)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r.size == 10, s"one row per query: ${r.size}")
    // the graded number IS the set overlap the IVF spec computes by hand
    val exact = Similarity.knnCosine(emb, nQueries = 10, k = 3)
      .select($"qid", $"vid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val ivf = Similarity.annIvf(emb, nQueries = 10, k = 3)
      .select($"qid", $"vid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    r.foreach { case (q, (hits, recallE6)) =>
      val want = exact.filter(_._1 == q).count(ivf.contains)
      assert(hits == want.toLong, s"q$q: hits $hits != set overlap $want")
      assert(recallE6 == hits * 1000000L / 3L, s"q$q: recall_e6 inconsistent")
    }
    // and the corpus-level mean is the usable-recall bound the IVF spec pins
    val mean = r.values.map(_._2).sum / r.size
    assert(mean >= 200000L, s"mean graded recall collapsed: $mean")
  }

  test("PQ/ADC: shortlist re-rank recovers usable exact-L2 recall; ranks by exact d2") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // exact integer-L2 ground truth over the quantized grid
    val q = emb.select($"vec_id",
      expr("transform(embedding, x -> cast(round(x * 1e6) as long))").as("qv"))
    val qs = q.filter($"vec_id" < 10).select($"vec_id".as("qid"), $"qv".as("qa"))
    val exact = q.crossJoin(broadcast(qs)).filter($"qid" =!= $"vec_id")
      .select($"qid", $"vec_id".as("vid"),
        expr("aggregate(zip_with(qa, qv, (x, y) -> (x - y) * (x - y)), 0L, (a, b) -> a + b)").as("d2"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid").orderBy($"d2", $"vid")))
      .filter($"rn" <= 3).select($"qid", $"vid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Similarity.annPq(emb).collect()
    val pq = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    info(f"PQ recall@3 over 10 queries: $recall%.2f (measured 0.77/0.93/0.70 at sf0.001/0.01/0.1)")
    assert(recall >= 0.5, s"PQ shortlist+re-rank recall collapsed: $recall")
    // within each query, output must be ordered by EXACT d2 (the re-rank
    // contract), not by the approximate ADC distance
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(4)).map(_.getLong(3))
      assert(byRank.sameElements(byRank.sorted), s"re-rank order broken: ${byRank.toSeq}")
    }
  }

  test("multimodal decode stub runs batched per partition with real schema") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "x")).toDF("doc_id", "text")
      .withColumn("payload", $"text".cast("binary"))
    val feats = Multimodal.decodeStub(docs).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(feats(1L)._1 == 11L)
    assert(feats.keySet == Set(1L, 2L))
  }

  test("imageio decode: PNG round-trips pixels exactly, JPEG dims survive, stub for non-image") {
    import spark.implicits._
    // PNG fixture path: decode must reproduce the closed-form stats exactly
    val docs = spark.range(0L, 40L).select($"id".as("doc_id"))
    val decoded = Multimodal.decodeImages(Multimodal.pngFixture(docs))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6))).toMap
    for (id <- 0L until 40L) {
      val (w, h) = (id % 13 + 3, id % 7 + 2)
      val expected = (for { x <- 0L until w; y <- 0L until h; c <- 0 to 2 }
        yield (id + 7 * x + 13 * y + 29 * c) % 256).sum
      // storedPng closed form: one stored deflate block over h*(1+3w) raw
      val plen = h * (3 * w + 1) + 68
      assert(decoded(id) == ((w, h, 3L, expected, plen, "imageio")), s"doc $id")
    }

    // JPEG path: lossy, so pixel sums are codec-dependent — but the decode
    // must engage (decoder=imageio) and dims/bands must be exact
    val jpegBytes = {
      val img = new java.awt.image.BufferedImage(
        17, 9, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (x <- 0 until 17; y <- 0 until 9) img.setRGB(x, y, (x * 15) << 16 | (y * 28))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val mixed = Seq((100L, jpegBytes), (101L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val m = Multimodal.decodeImages(mixed).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(6))).toMap
    assert(m(100L) == ((17L, 9L, 3L, "imageio")))
    assert(m(101L)._4 == "stub")
  }

  test("quality classifier: separates structured good/garbage docs from a 20% labeled slice") {
    import spark.implicits._
    // even ids: varied vocabulary with stopwords, no punctuation spam;
    // odd ids: one token repeated with heavy punctuation — the composite
    // gold splits them, and the trained bins must recover that split on
    // the 80% of docs whose gold verdict the model never saw
    val docs = spark.range(0L, 100L).select($"id".as("doc_id"),
      when($"id" % 2 === 0,
        concat(lit("the quick brown fox jumps over a lazy dog of unusual size and "),
          lit("grace in w"), $"id", lit(" x"), $"id", lit(" y"), $"id"))
        .otherwise(concat(lit("spam.spam!spam?spam.spam!spam?spam; z"), $"id"))
        .as("text"))
    val r = ext.TextOps.qualityClassifier(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(3), x.getLong(5), x.getBoolean(6)))).toMap
    // gold follows parity by construction
    assert((0L until 100L).forall(i => r(i)._1 == (1L - i % 2)),
      "composite gold must split the classes")
    // held-out docs (doc_id % 5 != 0): the trained model reproduces gold
    val held = (0L until 100L).filterNot(_ % 5 == 0)
    val agreeHeld = held.count(i => r(i)._3)
    assert(agreeHeld == held.size,
      s"trained classifier must separate held-out docs: $agreeHeld/${held.size}")
    // and it predicts BOTH classes (not a constant predictor)
    assert(r.values.exists(_._2 == 1L) && r.values.exists(_._2 == 0L))
  }

  test("phash hamming: JPEG re-encode found at hamming > 0; equality pairs always covered") {
    import spark.implicits._
    // a textured 64x64 gray image (LCG noise): JPEG's DCT quantization
    // shifts a couple of pooled cell means across the per-image mean
    // threshold, so the re-encoded copy sits at hamming 1-3 — visible to
    // the radius pass, invisible to the hamming-0 equality bucket
    def noiseImg(seed: Long): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = (seed + 7L * x + 13L * y) * 6364136223846793005L + 1442695040888963407L
        val g = ((v >>> 33) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val src = noiseImg(1L)
    // docs 3/4: byte-different but pixel-identical PNGs (a re-save), the
    // hamming-0 case the equality bucket does find
    val payloads = Seq(
      (1L, enc(src, "png")), (2L, enc(src, "jpg")),
      (3L, enc(noiseImg(9L), "png")), (4L, enc(noiseImg(9L), "png"))
    ).toDF("doc_id", "payload")
    val ham = Multimodal.aHashHammingPairs(payloads).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ham.contains((1L, 2L)) && ham((1L, 2L)) >= 1L && ham((1L, 2L)) <= 3L,
      s"JPEG re-encode must surface at hamming 1..3: $ham")
    assert(ham.get((3L, 4L)).contains(0L), s"identical pair at hamming 0: $ham")
    // the equality path misses the re-encoded pair and finds the identical
    // one — and every equality pair is covered by the radius pass (the
    // pigeonhole bound: equal hashes agree on all four blocks)
    val eq = Multimodal.aHashPairs(payloads, p = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!eq.contains((1L, 2L)), "equality bucket must miss the JPEG copy")
    assert(eq.subsetOf(ham.keySet), s"equality pairs not covered: ${eq -- ham.keySet}")
  }

  test("phash groups: re-encoded copies cluster; unrelated image stays singleton") {
    import spark.implicits._
    // same fixture family as the hamming spec: 1/2 are the PNG + its JPEG
    // re-encode (hamming 1-3), 3/4 pixel-identical re-saves (hamming 0),
    // 5 an unrelated texture (hamming ~32 to everything)
    def noiseImg(seed: Long): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = (seed + 7L * x + 13L * y) * 6364136223846793005L + 1442695040888963407L
        val g = ((v >>> 33) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val src = noiseImg(1L)
    val payloads = Seq(
      (1L, enc(src, "png")), (2L, enc(src, "jpg")),
      (3L, enc(noiseImg(9L), "png")), (4L, enc(noiseImg(9L), "png")),
      (5L, enc(noiseImg(99L), "png"))
    ).toDF("doc_id", "payload")
    val pairs = Multimodal.aHashHammingPairs(payloads).select($"doc_a", $"doc_b")
    val g = Dedup.ccGroupsConverged(payloads.select($"doc_id".as("v")), pairs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(g(1L) == ((1L, 1L)) && g(2L) == ((1L, 0L)),
      s"re-encoded copy must join its source's cluster: $g")
    assert(g(3L) == ((3L, 1L)) && g(4L) == ((3L, 0L)),
      s"pixel-identical re-saves must cluster: $g")
    assert(g(5L) == ((5L, 1L)), s"unrelated image must stay a canonical singleton: $g")
  }

  test("near-dup bucket cap drops boilerplate mega-buckets (no quadratic pairs)") {
    import spark.implicits._
    // 2000 identical docs would fill one band bucket and emit ~2M pairs;
    // with the cap they are excluded from LSH candidates entirely (exact
    // dedup J1 is the right tool for identical text). Two genuinely
    // near-dup docs must still surface.
    val boiler = spark.range(100L, 2100L)
      .select($"id".as("doc_id"), lit("t c1 c2 c3 c4 c5 c6 c7 c8 c9").as("text"))
    val near = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k")).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(near.unionByName(boiler)).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(0) >= 100L)) // mega-bucket dropped
  }

  test("simhash: near-identical docs have small hamming distance") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "a b c d e f g h i j k l m n o q"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12 z13 z14 z15 z16")).toDF("doc_id", "text")
    val h = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) < ham(h(1L), h(3L)))
  }

  test("repetition stats: known dup/top-bigram fractions; short docs degrade to zeros") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"),       // 4 tokens, 2 distinct; top bigram "a a" x2
      (2L, "x y z w"),       // all distinct, every bigram unique
      (3L, "solo")           // 1 token: no bigram
    ).toDF("doc_id", "text")
    val got = ext.TextOps.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 4 && got(1L).getLong(2) == 2)
    assert(got(1L).getLong(3) == 500000, "dup fraction (4-2)/4 = 0.5")
    assert(got(1L).getString(4) == "a a" && got(1L).getLong(5) == 2)
    assert(got(1L).getLong(6) == 1000000, "top bigram covers 2*2/4 tokens")
    assert(got(2L).getLong(3) == 0 && got(2L).getLong(5) == 1,
      "all-distinct doc: zero dup fraction, tie broken to smallest bigram")
    assert(got(2L).getString(4) == "x y", "lexicographically smallest of the tied bigrams")
    assert(got(3L).getString(4) == "" && got(3L).getLong(5) == 0 && got(3L).getLong(6) == 0)
  }

  test("pack sequences: per-source running offsets cut at the sequence length") {
    import spark.implicits._
    // 3 docs of 300 tokens in one source: offsets 0/300/600 -> seq ids 0/0/1
    // at seqLen 512; a second source restarts at offset 0.
    val text300 = Array.fill(300)("t").mkString(" ")
    val docs = Seq(
      ("s1", 1L, text300), ("s1", 2L, text300), ("s1", 3L, text300),
      ("s2", 9L, text300)
    ).toDF("source", "doc_id", "text")
    val got = ext.Pipeline.packSequences(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(("s1", 1L)) == ((0L, 0L, 0L)))
    assert(got(("s1", 2L)) == ((300L, 0L, 300L)))
    assert(got(("s1", 3L)) == ((600L, 1L, 88L)))
    assert(got(("s2", 9L)) == ((0L, 0L, 0L)), "sources pack independently")
  }

  test("token-budget mix: under-budget source keeps all; over-budget rate is budget/total") {
    import spark.implicits._
    val text100 = Array.fill(100)("t").mkString(" ")
    val docs = ((1L to 50L).map(i => ("big", i, text100)) :+ ("small", 99L, text100))
      .toDF("source", "doc_id", "text")
    val got = ext.Pipeline.tokenBudgetMix(docs, budget = 1000L).collect()
    val small = got.filter(_.getString(0) == "small")
    assert(small.forall(r => r.getLong(4) == 1000000L && r.getLong(6) == 1L),
      "under-budget source: rate 1, everything kept")
    val big = got.filter(_.getString(0) == "big")
    assert(big.forall(_.getLong(4) == 200000L), "5000 tokens vs budget 1000 -> rate 0.2")
    val kept = big.count(_.getLong(6) == 1L)
    assert(kept > 0 && kept < big.length, s"fractional rate keeps a strict subset ($kept/50)")
  }

  test("range search: exactly the pairs at/above the radius, kernel-consistent with knn") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = ext.Similarity.rangeSearch(emb).collect()
    assert(got.nonEmpty, "radius chosen non-vacuous on harness data")
    assert(got.forall(_.getLong(2) >= ext.Similarity.RangeCosE6))
    // kernel consistency: every knn hit above the radius appears in range output
    val knnAbove = ext.Similarity.knnCosine(emb).collect()
      .filter(_.getLong(2) >= ext.Similarity.RangeCosE6)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rangeSet = got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(knnAbove.subsetOf(rangeSet))
  }

  test("count-min: one-sided error (never undercounts), exact on a collision-free fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, Array.fill(50)("hot").mkString(" ") + " cold1 cold2 cold3"),
      (2L, "hot hot cold4 cold5")
    ).toDF("doc_id", "text")
    val got = ext.Sketches.cmsTopTokens(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("hot")._1 == 52L, "exact count of the heavy hitter")
    assert(got.values.forall(_._3 == 1L), s"count-min must never undercount: $got")
    // 7 distinct tokens in 4x256 cells: collisions are absent, so the
    // estimate is EXACT for every token
    assert(got.values.forall(v => v._1 == v._2), s"collision-free fixture must be exact: $got")
  }

  test("deterministic HLL: register file bounded by m, estimate within 3se of exact") {
    import spark.implicits._
    // 200 docs x ~20 distinct tokens each -> thousands of distinct items,
    // far above the 2.5m linear-counting cutoff
    val docs = (1L to 200L).map(i =>
      (i, (0 until 20).map(j => s"w${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val regs = ext.Sketches.hllRegisters(
      docs.select(concat($"doc_id", lit(":"), $"text").as("item")))
    val rows = regs.collect()
    assert(rows.length <= ext.Sketches.HllM)
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= ext.Sketches.HllRhoMax))
    val summary = ext.Sketches.hllDistinctPairs(docs).head
    assert(summary.getLong(3) == 4000L, "exact distinct (doc, token) pairs")
    assert(summary.getLong(5) == 1L,
      s"estimate ${summary.getLong(4) / 1e6} should be within 3se of 4000")
  }

  test("KMV: sets smaller than k are measured exactly; disjoint and identical sets") {
    import spark.implicits._
    // each lang's shingle set is far below k = 64, so sketches ARE the
    // sets: estimates exact, jaccard exact
    def doc(id: Long, lang: String, text: String) = (id, lang, text)
    val disjoint = Seq(
      doc(1, "en", "a b c d e f"),   // shingles: abc bcd cde def
      doc(2, "de", "p q r s t u")
    ).toDF("doc_id", "lang", "text")
    val r1 = ext.Sketches.kmvIntersect(disjoint).head
    assert(r1.getLong(1) == 4 && r1.getLong(2) == 4, s"exact set sizes: $r1")
    assert(r1.getLong(4) == 4 && r1.getLong(5) == 4 && r1.getLong(6) == 8,
      s"sub-k sketches estimate exactly: $r1")
    assert(r1.getLong(3) == 0 && r1.getLong(7) == 0 && r1.getLong(8) == 0,
      s"disjoint sets: zero intersection: $r1")
    val ident = Seq(
      doc(1, "en", "a b c d e f"),
      doc(2, "de", "a b c d e f")
    ).toDF("doc_id", "lang", "text")
    val r2 = ext.Sketches.kmvIntersect(ident).head
    assert(r2.getLong(7) == 1000000L && r2.getLong(8) == 4,
      s"identical sets: jaccard 1, intersection = set size: $r2")
  }

  test("KS drift: identical distributions give 0, disjoint give 1, known shift exact") {
    import spark.implicits._
    def ev(rows: Seq[(String, Double)]) =
      rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
        .toDF("event_id", "event_type", "value")
    // identical: D = 0
    val same = ev(Seq("click" -> 1.0, "click" -> 2.0, "purchase" -> 1.0, "purchase" -> 2.0))
    assert(ext.Drift.ksDrift(same).head.getLong(2) == 0L)
    // disjoint supports: D = 1
    val disj = ev(Seq("click" -> 1.0, "click" -> 2.0, "purchase" -> 10.0, "purchase" -> 11.0))
    assert(ext.Drift.ksDrift(disj).head.getLong(2) == 1000000L)
    // hand-computed: A = {1,1,2}, B = {1,2,2}; max |F_A - F_B| at bucket 1:
    // |2/3 - 1/3| = 1/3 -> floor e6 = 333333
    val mix = ev(Seq("click" -> 1.0, "click" -> 1.0, "click" -> 2.0,
      "purchase" -> 1.0, "purchase" -> 2.0, "purchase" -> 2.0))
    val r = ext.Drift.ksDrift(mix).head
    assert(r.getLong(2) == 333333L && r.getLong(3) == 1L, s"got $r")
  }

  test("lshBuckets: embeddings shorter/longer than PlaneDim still spread") {
    // Round-3 ADVICE trap: the zip_with projection null-padded any
    // non-64-dim embedding into a null dot -> every bit 0 -> all vectors
    // in bucket 0. LongDot's overlap semantics fix it; this locks the fix
    // for both the short (32-dim) and long (96-dim) public-API cases.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vecs(dim: Int) = spark.createDataFrame(
      (0L until 64L).map(i => (i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))))
      .toDF("vec_id", "embedding")
    for (dim <- Seq(32, 96)) {
      val buckets = Similarity.lshBuckets(vecs(dim))
        .groupBy("tbl").agg(countDistinct("bucket").as("nb")).collect()
      assert(buckets.forall(_.getLong(1) > 1),
        s"dim=$dim collapsed to one bucket per table: ${buckets.mkString(",")}")
    }
  }

  test("tfidf: corpus-wide terms score 0, rare terms rank first, hand-checked score") {
    import spark.implicits._
    // "common" is in every doc (idf = ln(4/4) = 0); each doc's unique
    // term appears twice -> score 2*ln(4). Ties break by term asc.
    val docs = Seq(
      (1L, "common aa aa bb"),
      (2L, "common cc cc bb"),
      (3L, "common dd dd zz"),
      (4L, "common ee ee zz")).toDF("doc_id", "text")
    val got = ext.TextOps.tfidfTopK(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3).toSeq == Seq("aa", "bb", "common"),
      s"doc 1 expected rare-first order, got ${d1.mkString(",")}")
    val twoLn4 = BigDecimal(math.log(4.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP) * 2
    assert(math.abs(d1.head._4 - twoLn4.toDouble) < 1e-9,
      s"aa score ${d1.head._4} != 2*round(ln 4, 6)")
    assert(got.filter(_._3 == "common").forall(_._4 == 0.0),
      "corpus-wide term must carry zero tf-idf")
    assert(got.groupBy(_._1).forall(_._2.length == 3), "top-3 per doc")
  }

  test("temperature mix: sqrt weights boost small sources without inverting order") {
    import spark.implicits._
    // big: 50 docs x 100 tokens = 5000; small: 2 docs x 50 = 100 tokens.
    // proportional share of small = 100/5100 ≈ 2.0%; sqrt-temperature
    // share = 10/(10+70) = 12.5% — boosted ~6x, but big still gets more.
    def doc(tag: String, i: Int, n: Int) = (1 to n).map(j => s"$tag${i}x$j").mkString(" ")
    val docs = ((1 to 50).map(i => (i.toLong, doc("b", i, 100), "big")) ++
      Seq((100L, doc("s", 1, 50), "small"), (101L, doc("s", 2, 50), "small")))
      .toDF("doc_id", "text", "source")
    val got = ext.Pipeline.temperatureMix(docs, budget = 1000).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap // source -> (total, w, target, rate_e6)
    val (bt, bw, btg, _) = got("big")
    val (st, sw, stg, srate) = got("small")
    assert(bt == 5000L && st == 100L)
    assert(bw == 70L && sw == 10L, s"isqrt weights: $bw, $sw") // floor(sqrt(5000))=70
    // targets: 1000*70/80 = 875, 1000*10/80 = 125
    assert(btg == 875L && stg == 125L, s"targets: $btg, $stg")
    // small's temperature target (125 tokens -> rate capped at 100%)
    // strictly exceeds its PROPORTIONAL corpus share of the same budget
    // (1000 * 100/5100 = 19 tokens)
    val propTarget = 1000L * st / (bt + st)
    assert(srate == 1000000L && stg > propTarget,
      s"temperature must boost the small source: target $stg vs proportional $propTarget")
    // order not inverted: big's absolute target still exceeds small's
    assert(btg > stg)
  }

  test("keep-best dedup: the high-quality member survives, not the min id") {
    import spark.implicits._
    // docs 1 and 2 are shingle near-dups (J = 97/99 ≈ 0.98): doc 1 (the
    // MIN id, i.e. the id-keyed canonical) repeats a token, so its
    // lexical-diversity term is lower — the quality-keyed rule must keep
    // doc 2 instead. doc 3 is an unrelated singleton (kept trivially).
    val base = (1 to 99).map(i => s"t$i")
    val docs = Seq(
      (1L, (base :+ "t50").mkString(" ")),  // 100 tokens, 99 distinct
      (2L, (base :+ "t100").mkString(" ")), // 100 tokens, all distinct
      (3L, (1 to 30).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val groups = Dedup.nearDupGroupsConverged(docs)
    val scored = docs.select($"doc_id", ext.TextOps.compositeScoreSpark.as("score"))
    val g = groups.join(scored, Seq("doc_id"))
    val best = g.groupBy($"cluster_id")
      .agg(min(struct((-$"score").as("ns"), $"doc_id")).as("m"))
      .select($"cluster_id", $"m.doc_id".as("best_doc_id"))
    val got = g.join(best, Seq("cluster_id"))
      .select($"doc_id", $"cluster_id", $"best_doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L)._1 == 1L && got(2L)._1 == 1L, "near-dups share a cluster")
    assert(got(1L)._2 == 2L, s"quality keep rule must pick doc 2, got ${got(1L)._2}")
    assert(got(3L)._2 == 3L, "singleton keeps itself")
  }

  test("decontam eval report: leaked grams attributed per eval doc; short docs report 0") {
    import spark.implicits._
    val leak = (1 to 13).map(i => s"q$i").mkString(" ") // one exact 13-gram
    def pad(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (0L, leak + " " + pad("e", 10)),      // eval: leaks its first 13-gram
      (1L, pad("c", 25)),                   // eval: clean
      (2L, "a b c"),                        // eval: < 13 tokens -> no grams
      (30L, pad("x", 7) + " " + leak),      // train: carries the gram
      (31L, leak + " " + pad("y", 5)),      // train: carries it too
      (32L, pad("w", 30))                   // train: unrelated
    ).toDF("doc_id", "text")
    val got = ext.Pipeline.decontamEvalReport(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L), "one row per eval doc, incl. gram-less")
    // doc 0: 11 distinct 13-grams, exactly 1 leaked, found in 2 train docs
    assert(got(0L) == ((11L, 1L, 2L, 1L)), s"${got(0L)}")
    assert(got(1L) == ((13L, 0L, 0L, 0L)), s"${got(1L)}")
    assert(got(2L) == ((0L, 0L, 0L, 0L)), s"${got(2L)}")
  }

  test("langid ngram: classifies real-language held-out docs the marker heuristic cannot") {
    import spark.implicits._
    // train slice = doc_id % 5 == 0; held-out docs carry real language
    // content but NONE of the heuristic's marker tokens, so the stopword
    // classifier defaults to 'en' on them while the trigram profiles carry
    // the signal. (The harness corpus has label-independent content, so
    // THIS fixture is where discriminative power is proven.)
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog and then the cat sleeps", "en"),
      (5L, "die katze schlaeft und der hund laeuft schnell durch den garten heute", "de"),
      (10L, "el perro corre y la casa es buena para los gatos y perros buenos", "es"),
      (15L, "the dog and the fox run over the green hill and the cat watches", "en"),
      // held-out (not in the train slice):
      (1L, "katzen schlafen hunde laufen schnell durch einen garten", "de"),
      (2L, "perros corren casas buenas gatos buenos los caminos", "es"),
      (3L, "quick brown foxes jump over lazy dogs then sleep", "en")
    ).toDF("doc_id", "text", "lang")
    val got = ext.TextOps.langIdNgram(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getString(4),
        r.getBoolean(5), r.getBoolean(6)))).toMap
    for (id <- Seq(1L, 2L)) {
      assert(got(id)._1 == (if (id == 1L) "de" else "es"),
        s"doc $id: content classifier predicted ${got(id)._1}")
      assert(got(id)._2 == "en" && !got(id)._4,
        s"doc $id: marker heuristic should default to en, got ${got(id)._2}")
    }
    assert(got(3L)._1 == "en", s"held-out en doc predicted ${got(3L)._1}")
    // measured agreement: content classifier strictly beats the heuristic
    val ag = ext.TextOps.langIdAgreement(docs).collect().head
    assert(ag.getLong(1) > ag.getLong(2),
      s"ngram agree ${ag.getLong(1)} must beat stopword agree ${ag.getLong(2)} on this fixture")
    // a doc with no profile trigram overlap is 'und', score 0
    val und = ext.TextOps.langIdNgram(
      docs.union(Seq((4L, "zzzz", "en")).toDF("doc_id", "text", "lang"))).collect()
      .find(_.getLong(0) == 4L).get
    assert(und.getString(2) == ext.TextOps.LangUnknown && und.getLong(3) == 0L)
  }

  test("emb drift: negative-sum means truncate toward zero (sa=-7, n_a=2 -> -3)") {
    import spark.implicits._
    // the Spark half of the signed-division parity fixture (tools/check.py
    // pins the DuckDB half): group a sums to -7 over 2 rows on dim 1, so
    // the mean must be -7 div 2 = -3 (truncation toward zero), NOT floor's
    // -4 — a silent engine-semantics change fails loudly here.
    val emb = Seq(
      (0L, Seq(-0.000003f), 0),
      (1L, Seq(-0.000004f), 0),
      (2L, Seq(0.000005f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = ext.Drift.embDrift(emb).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 2L && row.getLong(2) == 1L) // n_a, n_b
    assert(row.getLong(3) == -3L, s"mean_a_e6 = ${row.getLong(3)}, want -3 (truncate toward zero)")
    assert(row.getLong(4) == 5L && row.getLong(5) == 8L) // mean_b, |shift|
  }

  test("scrub spans: overlapping runs merge, boundary grams, sub-n docs pass through") {
    import spark.implicits._
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ") // shared 12-token block
    def uniq(tag: String) = (1 to 20).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, boiler + " " + uniq("x")), // boilerplate prefix + unique tail
      (2L, boiler + " " + uniq("y")),
      (3L, "b1 b2 b3 b4 b5"),         // < n tokens: no grams, untouched even
                                      // though every token matches boilerplate
      (4L, boiler),                   // docs 4/5: fully boilerplate
      (5L, boiler)
    ).toDF("doc_id", "text")
    val got = ext.Dedup.scrubSpans(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))).toMap
    // docs 1/2: duplicated 10-grams start at token positions 1..3 (the only
    // grams fully inside the shared block) — three OVERLAPPING runs
    // [1,10],[2,11],[3,12] merge to exactly tokens 1..12 removed.
    // chars: b1..b9 = 2 each, b10..b12 = 3 -> removed 27; tail x1..x9 = 2,
    // x10..x20 = 3 -> 51; total 78. frac = 27e6 div 78 = 346153.
    assert(got(1L) == ((32L, 12L, 78L, 27L, 346153L, uniq("x"))), s"${got(1L)}")
    assert(got(2L) == ((32L, 12L, 78L, 27L, 346153L, uniq("y"))), s"${got(2L)}")
    // doc-boundary: doc 3 has no 10-gram -> nothing scrubbed
    assert(got(3L) == ((5L, 0L, 10L, 0L, 0L, "b1 b2 b3 b4 b5")), s"${got(3L)}")
    // fully-duplicated docs scrub to empty (frac = 100%)
    assert(got(4L) == ((12L, 12L, 27L, 27L, 1000000L, "")), s"${got(4L)}")
    assert(got(5L)._6 == "")
    // the transform closes the loop with the verdict: re-scoring the
    // SCRUBBED corpus with dupNgramFrac leaves nothing above the 30% gate
    // (docs 4/5 scrub below the gram length and emit no row at all)
    val rescored = docs.select($"doc_id")
      .join(ext.Dedup.scrubSpans(docs)
        .select($"doc_id", $"scrubbed_text".as("text")), Seq("doc_id"))
    val re = ext.Dedup.dupNgramFrac(rescored).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(re.nonEmpty && re.forall(t => t._2 == 0L && t._3 == 0L),
      s"scrubbed corpus must re-score clean, got ${re.mkString(",")}")
  }

  test("line dedup: aligned duplicated lines removed; disagrees with gram scrub below n tokens") {
    import spark.implicits._
    // shared 5-token line (one full LineTokens chunk), line-ALIGNED in two
    // docs — too short to ever form a 10-gram, so the gram scrub MUST
    // keep it while the line pass MUST remove it (the grain-disagreement
    // fixture the two transforms are designed around)
    val docs = Seq(
      (1L, "c1 c2 c3 c4 c5 x1 x2 x3 x4 x5"),
      (2L, "c1 c2 c3 c4 c5 y1 y2 y3 y4 y5"),
      (3L, "c1 c2 c3"),                // sub-width doc: one short unique line
      (4L, "d1 d2 d3 d4 d5 d6 d7"),    // docs 4/5 identical: both lines
      (5L, "d1 d2 d3 d4 d5 d6 d7")     //   (full + 2-token tail) removed
    ).toDF("doc_id", "text")
    val got = ext.Dedup.lineDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))).toMap
    assert(got(1L) == ((2L, 1L, 20L, 10L, 500000L, "x1 x2 x3 x4 x5")), s"${got(1L)}")
    assert(got(2L) == ((2L, 1L, 20L, 10L, 500000L, "y1 y2 y3 y4 y5")), s"${got(2L)}")
    assert(got(3L) == ((1L, 0L, 6L, 0L, 0L, "c1 c2 c3")), s"${got(3L)}")
    assert(got(4L) == ((2L, 2L, 14L, 14L, 1000000L, "")), s"${got(4L)}")
    assert(got(5L)._6 == "")
    // the disagreement, stated both ways: the gram scrub keeps docs 1/2
    // whole (their only 10-gram is the full doc, which differs), and the
    // line pass removed text from them
    val scrub = ext.Dedup.scrubSpans(docs.filter($"doc_id" <= 2)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scrub(1L) == 0L && scrub(2L) == 0L,
      s"gram scrub must keep the sub-n duplicated line: $scrub")
    assert(got(1L)._2 == 1L && got(2L)._2 == 1L)
  }

  test("line dedup composes with the gram verdict: deduped sf0.001 corpus re-scores lower") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val before = ext.Dedup.dupNgramFrac(docs)
      .agg(sum($"n_dup")).collect().head.getLong(0)
    val deduped = ext.Dedup.lineDedup(docs)
      .filter(length($"deduped_text") > 0)
      .select($"doc_id", $"deduped_text".as("text"))
    val after = ext.Dedup.dupNgramFrac(deduped)
      .agg(coalesce(sum($"n_dup"), lit(0L))).collect().head.getLong(0)
    // line-aligned synthetic boilerplate means the 5-token grain removes
    // every duplicated 10-gram here (2292 -> 0 at this corpus); the
    // portable invariant is strict reduction
    assert(before > 0L && after < before,
      s"dup-gram mass must drop: before=$before after=$after")
  }

  test("bloom probe: no false negatives; saturated tiny filter FPs measured; production m clean") {
    import spark.implicits._
    // corpus (doc_id % 10 != 0): doc 1's line is the known duplicate;
    // docs 2..9 are distinct-word filler (2 lines each -> 17 corpus lines,
    // 51 position inserts — saturates an 8-bit filter)
    val filler = (2L to 9L).map { d =>
      (d, (1 to 10).map(i => s"w${d}_$i").mkString(" "))
    }
    val docs = (Seq(
      (1L, "a b c d e"),
      // batch doc 10: one EXACT corpus dup line + one novel line
      (10L, "a b c d e x1 x2 x3 x4 x5")
    ) ++ filler).toDF("doc_id", "text")
    def row(m: Int) = ext.Dedup.bloomLineProbe(docs, mBits = m).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // tiny m = 8: 51 inserts occupy every slot, so the NOVEL line is a
    // false positive — the filter says dup, the exact twin says no, and
    // the drop verdict fires on the filter's (wrong) answer, exactly as
    // the production op (which has no exact set) would decide
    val tiny = row(8)(10L)
    assert(tiny == ((2L, 2L, 1L, 1L, 1000000L, 1L)), s"tiny-m: $tiny")
    // production m = 2^19: the dup line hits (no false negatives — every
    // inserted line's positions are all set), the novel line misses
    val prod = row(ext.Dedup.BloomBits)(10L)
    assert(prod == ((2L, 1L, 1L, 0L, 500000L, 0L)), s"prod-m: $prod")
  }

  test("bloom stats: saturated filter predicts AND measures FPR 1.0; counts consistent") {
    import spark.implicits._
    val filler = (2L to 9L).map { d =>
      (d, (1 to 10).map(i => s"w${d}_$i").mkString(" "))
    }
    val docs = (Seq(
      (1L, "a b c d e"),
      (10L, "a b c d e x1 x2 x3 x4 x5")
    ) ++ filler).toDF("doc_id", "text")
    // m = 8: 51 inserts saturate every slot -> fill 1e6, predicted fpr
    // fill^3 = 1e6, and the one novel batch line IS a false positive ->
    // measured fpr 1e6: the model and the measurement agree at the
    // degenerate point exactly
    val r = ext.Dedup.bloomStats(docs, mBits = 8).collect()(0)
    def g(n: String) = r.getLong(r.fieldIndex(n))
    assert(g("fill_e6") == 1000000L && g("predicted_fpr_e6") == 1000000L,
      s"saturated fill/prediction: $r")
    assert(g("n_novel") == 1L && g("n_false_pos") == 1L
      && g("measured_fpr_e6") == 1000000L, s"measured fpr: $r")
    assert(g("n_bloom_hits") == g("n_exact_dups") + g("n_false_pos"), s"count identity: $r")
  }

  test("bloom upsert: dropped doc never inserts; kept doc's novel positions flagged new") {
    import spark.implicits._
    // corpus: 4 distinct lines. batch doc 10: 4 corpus-dup lines + 1 novel
    // (80% dup -> DROPPED; its novel line "n1.." must NOT enter the set).
    // batch doc 20: 1 dup + 4 novel (20% -> KEPT; novels enter is_new=1).
    val corpusText = (1 to 4).flatMap(l => (1 to 5).map(i => s"c${l}_$i")).mkString(" ")
    val docs = Seq(
      (1L, corpusText),
      (10L, ((1 to 4).flatMap(l => (1 to 5).map(i => s"c${l}_$i")) ++
        (1 to 5).map(i => s"n$i")).mkString(" ")),
      (20L, ((1 to 5).map(i => s"c1_$i") ++
        (1 to 20).map(i => s"k$i")).mkString(" "))
    ).toDF("doc_id", "text")
    val up = ext.Dedup.bloomUpsert(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val standing = ext.Dedup.bloomPositionSet(
      ext.Dedup.bloomDocLines(docs.filter($"doc_id" === 1L)))
      .collect().map(_.getLong(0)).toSet
    def posOf(line: String): Set[Long] = ext.Dedup.BloomSeeds.map(sd =>
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$sd:$line").take(8), 16)
        % ext.Dedup.BloomBits).toSet
    // standing positions all is_new = 0
    standing.foreach(p => assert(up(p) == 0L, s"standing pos $p flagged new"))
    // doc 10 is dropped: its novel line's positions are absent (unless a
    // position collides with the standing set, where it is is_new=0)
    posOf((1 to 5).map(i => s"n$i").mkString(" ")).foreach { p =>
      assert(!up.contains(p) || standing.contains(p),
        s"dropped doc's novel position $p entered the index")
    }
    // doc 20 is kept: each novel line's positions present; new ones flagged
    val kLines = (0 until 4).map(b => (1 to 20).slice(b * 5, b * 5 + 5)
      .map(i => s"k$i").mkString(" "))
    kLines.flatMap(posOf).foreach { p =>
      assert(up.contains(p), s"kept doc's position $p missing")
      assert(up(p) == (if (standing.contains(p)) 0L else 1L), s"pos $p flag wrong")
    }
  }

  test("gopher gate: each rule fires alone, the clean doc passes all five") {
    import spark.implicits._
    def words(n: Int, tag: String) = (1 to n).map(i => s"$tag$i")
    val goodBody = (words(20, "alpha") ++ Seq("the", "of") ++ words(38, "beta")).mkString(" ")
    val docs = Seq(
      (1L, goodBody, "s"),                                     // passes all
      (2L, (Seq("the", "of") ++ words(10, "x")).mkString(" "), "s"),  // too short
      (3L, (Seq("the", "of") ++ words(58, "supercalifragilistic")).mkString(" "), "s"), // words too long
      (4L, ("the of " + words(58, "y").mkString(" ")).replace("y1", "y1.!?.,;:!?.,;"), "s"), // symbol-heavy
      (5L, words(60, "z").mkString(" "), "s"),                 // no stopwords
      (6L, (Seq("the", "of") ++ Seq.fill(58)("dup")).mkString(" "), "s") // repetition
    ).toDF("doc_id", "text", "source")
    val r = ext.Pipeline.gopherGate(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(7), x.getLong(8), x.getLong(9),
        x.getLong(10), x.getLong(11), x.getLong(12)))).toMap
    assert(r(1L) == ((1L, 1L, 1L, 1L, 1L, 1L)), s"clean doc: ${r(1L)}")
    assert(r(2L)._1 == 0L && r(2L)._6 == 0L, s"length rule: ${r(2L)}")
    assert(r(3L)._2 == 0L && r(3L)._6 == 0L, s"word-length rule: ${r(3L)}")
    assert(r(4L)._3 == 0L && r(4L)._6 == 0L, s"symbol rule: ${r(4L)}")
    assert(r(5L)._4 == 0L && r(5L)._6 == 0L, s"stopword rule: ${r(5L)}")
    assert(r(6L)._5 == 0L && r(6L)._6 == 0L, s"repetition rule: ${r(6L)}")
  }

  test("ppl buckets: per-language terciles are balanced and ordered by LM score") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val r = ext.Pipeline.pplBuckets(docs).collect()
      .map(x => (x.getString(1), x.getDouble(2), x.getLong(5)))
    val byLang = r.groupBy(_._1)
    assert(byLang.nonEmpty)
    for ((lang, xs) <- byLang) {
      val sizes = xs.groupBy(_._3).view.mapValues(_.size).toMap
      val n = xs.size
      // explicit-formula terciles: sizes differ by at most 1
      assert(sizes.keySet.subsetOf(Set(1L, 2L, 3L)))
      assert(sizes.values.max - sizes.values.min <= 1, s"$lang: $sizes (n=$n)")
      // ordering: every head score <= every tail score
      val head = xs.filter(_._3 == 1L).map(_._2)
      val tail = xs.filter(_._3 == 3L).map(_._2)
      assert(head.max <= tail.min, s"$lang: head/tail overlap")
    }
  }

  test("span corruption: splicing target spans back into input reconstructs every doc") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    val rows = ext.Pipeline.spanCorrupt(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getString(6), r.getString(7)))).toMap
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sentinel = "<extra_id_(\\d+)>".r
    for ((id, (nm, inp, tgt)) <- rows) {
      // target spans by ordinal
      val spans = scala.collection.mutable.Map[Int, List[String]]()
      var cur = -1
      tgt.split(" ").filter(_.nonEmpty).foreach {
        case sentinel(j) => cur = j.toInt; spans(cur) = Nil
        case tok => spans(cur) = spans(cur) :+ tok
      }
      assert(spans.size == nm, s"doc $id: ${spans.size} spans vs $nm masked blocks")
      val rebuilt = inp.split(" ").filter(_.nonEmpty).flatMap {
        case sentinel(j) => spans(j.toInt)
        case tok => Seq(tok)
      }.mkString(" ")
      assert(rebuilt == orig(id), s"doc $id does not reconstruct")
    }
    // the draw is a pure function of (seed, doc, block): a re-run is
    // byte-identical, a reseed changes the masking
    val again = ext.Pipeline.spanCorrupt(docs).collect()
      .map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(rows.forall { case (id, (_, inp, _)) => again(id) == inp })
    val reseeded = ext.Pipeline.spanCorrupt(docs, seed = 24).collect()
      .map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(rows.exists { case (id, (_, inp, _)) => reseeded(id) != inp })
  }

  test("incremental semdedup: batch paraphrase drops against the kept member, novel direction survives") {
    import spark.implicits._
    // corpus = oldest 90% of ids (0..8): two direction clusters + a
    // diagonal; batch = ids 9, 10. v9 paraphrases the x-cluster (whose
    // kept member is min id 0); v10 points away from every corpus vector.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.1f, 0.9f)), (4L, Seq(0.707f, 0.707f)), (5L, Seq(0.95f, 0.05f)),
      (6L, Seq(0.05f, 0.95f)), (7L, Seq(0.8f, 0.2f)), (8L, Seq(0.2f, 0.8f)),
      (9L, Seq(0.92f, 0.08f)),   // batch: paraphrase of the x-cluster
      (10L, Seq(-1.0f, -0.1f))   // batch: novel direction
    ).toDF("vec_id", "embedding")
    val got = ext.Similarity.semDedupIncremental(emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == Set(9L, 10L), s"one row per batch vector: $got")
    assert(got(9L)._3 == 0L && got(9L)._1 == 0L &&
      got(9L)._2 >= ext.Similarity.SemDedupCosE6,
      s"paraphrase must drop against kept member 0: ${got(9L)}")
    assert(got(10L)._3 == 1L && got(10L)._2 < ext.Similarity.SemDedupCosE6,
      s"novel direction must survive: ${got(10L)}")
  }

  test("semdedup: same-neighborhood paraphrases dedup; cross-cell high-cosine survives") {
    import spark.implicits._
    // two tight direction clusters + one diagonal vector. N=5 -> ncells =
    // ceil(sqrt(5)) = 3, stride 1 -> seeds {0,1,2}; after two Lloyd rounds
    // the clusters separate. v4 sits at 45 degrees: cos(v4, v0) = 0.707 >=
    // the 0.35 threshold, but v4 and v0 land in DIFFERENT cells, so
    // SemDeDup (by design) never pairs them — the intra-cell approximation
    // the published method trades for sqrt(N) scaling.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),  // paraphrase of v0 (cos 0.994)
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.1f, 0.9f)),  // paraphrase of v2 (cos 0.994)
      (4L, Seq(0.707f, 0.707f))
    ).toDF("vec_id", "embedding")
    val got = ext.Similarity.semDedup(emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 5, "every vector gets a row")
    // paraphrase pairs collapse to one near-set each, min id kept
    assert(got(0L)._2 == 0L && got(0L)._3 == 1L, s"${got(0L)}")
    assert(got(1L)._2 == 0L && got(1L)._3 == 0L, s"${got(1L)}")
    assert(got(2L)._2 == 2L && got(2L)._3 == 1L, s"${got(2L)}")
    assert(got(3L)._2 == 2L && got(3L)._3 == 0L, s"${got(3L)}")
    // the two clusters stay distinct near-sets in distinct cells
    assert(got(0L)._1 != got(2L)._1, "clusters must land in different cells")
    // v4: above-threshold cosine to BOTH clusters, but it either pairs
    // within its own cell or stays singleton — it must NOT merge the two
    // clusters (they share no cell with each other)
    assert(got(0L)._2 != got(2L)._2, "cross-cell pair must not merge sets")
  }

  test("semdedup state upsert: dropped paraphrase never enters the index, novel vector does") {
    import spark.implicits._
    // the incremental-semdedup fixture: corpus ids 0..8, batch 9 (a
    // paraphrase of kept member 0 — dropped) and 10 (novel — kept)
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.1f, 0.9f)), (4L, Seq(0.707f, 0.707f)), (5L, Seq(0.95f, 0.05f)),
      (6L, Seq(0.05f, 0.95f)), (7L, Seq(0.8f, 0.2f)), (8L, Seq(0.2f, 0.8f)),
      (9L, Seq(0.92f, 0.08f)), (10L, Seq(-1.0f, -0.1f))
    ).toDF("vec_id", "embedding")
    val up = ext.Similarity.semDedupIncrementalUpsert(spark, "spec_upsert_fixture", emb)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(!up.contains(9L), s"dropped paraphrase must not enter the index: $up")
    assert(up.contains(10L) && up(10L)._2 == 1L, s"novel vector joins, flagged new: $up")
    // the standing members are exactly the state-table kept set, is_new 0
    val verdicts = ext.Similarity.semDedupIncrementalState(spark,
      "spec_upsert_fixture", emb).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(verdicts(9L) == 0L && verdicts(10L) == 1L)
    val standing = up.filter(_._2._2 == 0L).keySet
    assert(standing.nonEmpty && standing.subsetOf((0L to 8L).toSet),
      s"standing members come from the corpus: $standing")
  }

  test("lsh state upsert: dropped dup never indexed, kept doc joins, sub-shingle doc kept but unindexable") {
    import spark.implicits._
    def words(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    // incoming carve = ids 0, 10, 20: doc 0 duplicates corpus doc 1 (drop),
    // doc 10 is unique (keep -> indexed), doc 20 has < 3 tokens (keep, but
    // no shingles -> contributes no index rows)
    val base = words("c", 30)
    val docs = Seq(
      (0L, base), (1L, base),
      (10L, words("u", 30)),
      (20L, "only two"),
      (2L, words("p", 30)), (3L, words("q", 30)))
      .toDF("doc_id", "text")
    val up = ext.Dedup.incrementalNearDupUpsert(spark, "spec_lsh_upsert", docs)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
    val byDoc = up.groupBy(_._1)
    assert(!byDoc.contains(0L), s"dropped duplicate must not enter the index: $up")
    assert(byDoc(10L).forall(_._2 == 1L) && byDoc(10L).nonEmpty,
      s"kept unique doc joins the index flagged new: $up")
    assert(!byDoc.contains(20L), s"sub-shingle doc contributes no index rows: $up")
    assert(byDoc.contains(1L) && byDoc(1L).forall(_._2 == 0L),
      s"standing corpus rows keep is_new = 0: $up")
    // verdicts agree: 0 dropped, 10 and 20 kept
    val v = ext.Dedup.incrementalNearDupState(spark, "spec_lsh_upsert", docs)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(v == Map(0L -> "drop", 10L -> "keep", 20L -> "keep"), s"$v")
  }

  test("state-table forms equal their recompute twins (semdedup inc + lsh inc)") {
    val d = "/root/testdata/sf0.001"
    // semantic: frozen centroids + kept members persisted, batch-side read
    val semRe = ext.Similarity.semDedupIncremental(Tables.embeddings(spark, d))
      .collect().map(_.toSeq).toSet
    val semSt = ext.Similarity.semDedupIncrementalState(spark, d,
      Tables.embeddings(spark, d)).collect().map(_.toSeq).toSet
    assert(semSt == semRe, "semdedup state form must be row-identical to recompute")
    // lexical: standing LSH band index + shingle sets persisted
    val lshRe = ext.Dedup.incrementalNearDup(Tables.documents(spark, d))
      .collect().map(_.toSeq).toSet
    val lshSt = ext.Dedup.incrementalNearDupState(spark, d,
      Tables.documents(spark, d)).collect().map(_.toSeq).toSet
    assert(lshSt == lshRe, "lsh state form must be row-identical to recompute")
    // drift monitor: persisted centroids + standing histogram, batch-only
    // assignment (round-14 verdict #3)
    val psiRe = ext.Similarity.cellDrift(Tables.embeddings(spark, d))
      .collect().map(_.toSeq).toSet
    val psiSt = ext.Similarity.cellDriftState(spark, d,
      Tables.embeddings(spark, d)).collect().map(_.toSeq).toSet
    assert(psiSt == psiRe, "cell-PSI state form must be row-identical to recompute")
  }

  test("fused aHash equals the distributed pool/threshold chain") {
    val d = "/root/testdata/sf0.001"
    val pf = ext.Multimodal.pngFixture(Tables.documents(spark, d))
    val dist = ext.Multimodal.aHash(pf, 8)
      .select("doc_id", "ahash").collect().map(_.toSeq).toSet
    val fused = ext.Multimodal.aHashLocal(pf)
      .collect().map(_.toSeq).toSet
    assert(fused == dist,
      "the single-pass aHash must be bit-identical to the pooled chain")
  }

  test("image state form equals the recompute probe (persisted aHash index)") {
    val d = "/root/testdata/sf0.001"
    val re = ext.Multimodal.incrementalImages(Tables.documents(spark, d))
      .collect().map(_.toSeq).toSet
    val st = ext.Multimodal.incrementalImagesState(spark, d,
      Tables.documents(spark, d)).collect().map(_.toSeq).toSet
    assert(st == re, "image state form must be row-identical to recompute")
  }

  test("five-gate state audit equals the recompute audit (every modality read from tables)") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
    val emb = Tables.embeddings(spark, d)
    val sem = ext.Similarity.semGateVerdicts(spark, d, emb,
      emb.filter($"vec_id" % 10 === 0).select($"vec_id"))
    val groups = ext.Dedup.ccGroupsConverged(
      docs.select($"doc_id".as("v")),
      ext.Multimodal.aHashHammingPairs(ext.Multimodal.pngFixture(docs))
        .select($"doc_a", $"doc_b"))
    val re = ext.Pipeline.ingestAuditMm(docs, sem, groups)
      .collect().map(_.toSeq).toSet
    val st = ext.Pipeline.ingestAuditStateMm(spark, d, docs, sem)
      .collect().map(_.toSeq).toSet
    assert(st == re, "five-gate state read must be row-identical to the recompute audit")
  }

  test("image upsert: dropped duplicate never indexed, kept doc joins flagged new") {
    import spark.implicits._
    // pngFixture images repeat with period lcm(13, 7, 256) = 23296 in
    // doc_id, so 23300 (batch: % 10 == 0) is BYTE-IDENTICAL to standing
    // doc 4 (% 10 == 4) — a genuine cross-carve duplicate with no payload
    // injection; 50 is unique among these ids (verified by the verdict
    // assertion below, which would fail if it near-dup'd anything).
    val docs = Seq(4L, 3L, 7L, 23300L, 50L).toDF("doc_id")
    val up = ext.Multimodal.incrementalImagesUpsert(docs)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
    val byDoc = up.groupBy(_._1)
    assert(!byDoc.contains(23300L), s"dropped duplicate must not enter the index: $up")
    assert(byDoc.contains(50L) && byDoc(50L).forall(_._2 == 1L),
      s"kept unique doc joins the index flagged new: $up")
    assert(byDoc.contains(4L) && byDoc(4L).forall(_._2 == 0L),
      s"standing rows keep is_new = 0: $up")
    val v = ext.Multimodal.incrementalImages(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(v.collect { case (23300L, m, hm, vd) => (m, hm, vd) }.toSeq ==
      Seq((4L, 0L, "drop")),
      s"the duplicate must match its standing source at hamming 0: ${v.toSeq}")
    assert(v.collect { case (50L, _, _, vd) => vd }.toSeq == Seq("keep"),
      s"the unique doc must be kept: ${v.toSeq}")
  }

  test("image upsert2: a batch-2 copy of a batch-1-kept image drops ACROSS the ingest boundary") {
    import spark.implicits._
    // standing {1, 3}; batch 1 = {30} (% 20 == 10); batch 2 = {20, 40}
    // (% 20 == 0). Payload injection gives doc 20 EXACTLY doc 30's PNG
    // bytes — the carve arithmetic cannot produce that copy naturally
    // (23296k ≡ 10 (mod 20) has no solution), which is the point: only
    // the night-1 insert can catch it.
    val ids = Seq(1L, 3L, 30L, 40L).toDF("doc_id")
    val base = ext.Multimodal.pngFixture(ids)
    val payloads = base.unionByName(
      base.filter($"doc_id" === 30L).select(lit(20L).as("doc_id"), $"payload"))
    val docs = Seq(1L, 3L, 20L, 30L, 40L).toDF("doc_id")
    // the copy is invisible to v0: doc 20's hash is NOT within the radius
    // of any standing hash, so a probe of the pre-night-1 index keeps it
    val h = ext.Multimodal.aHashLocal(payloads)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1L, 3L).foreach { s =>
      assert(java.lang.Long.bitCount(h(20L) ^ h(s)) >
        ext.Multimodal.AHashHamMaxHamming,
        s"fixture: doc 20 must be novel vs standing doc $s")
    }
    val up = ext.Multimodal.incrementalImagesUpsert2(docs,
        payloads0 = Some(payloads))
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
    val byDoc = up.groupBy(_._1)
    assert(byDoc.contains(30L) && byDoc(30L).forall(_._2 == 1L),
      s"batch-1 unique doc must be kept and attributed batch_no = 1: $up")
    assert(!byDoc.contains(20L),
      s"batch-2 copy of the batch-1 insert must drop across the boundary: $up")
    assert(byDoc.contains(40L) && byDoc(40L).forall(_._2 == 2L),
      s"batch-2 unique doc kept, attributed batch_no = 2: $up")
    assert(Seq(1L, 3L).forall(s => byDoc(s).forall(_._2 == 0L)),
      s"standing rows preserved at batch_no = 0: $up")
  }

  test("packFit: whole docs never straddle; FFD beats concat-chunk on the crafted mix") {
    import spark.implicits._
    // six docs that FFD packs PERFECTLY (300+212 = 512 three times) while
    // concat-chunk in doc order (300,300,300,212,212,212) splits docs at
    // every boundary; plus one oversized doc that must get a bin alone
    val counts = Seq((0L, 300L), (1L, 300L), (2L, 300L),
      (3L, 212L), (4L, 212L), (5L, 212L), (6L, 600L))
      .toDF("doc_id", "n_tokens")
    val got = ext.Pipeline.packFit(counts).collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L, 6L), "bijection over docs")
    // no doc straddles: offset + n <= seqLen except the oversized loner
    val sizes = counts.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, (_, off, _)) <- got if id != 6L)
      assert(off + sizes(id) <= 512L, s"doc $id straddles")
    // the oversized doc sits alone at offset 0
    assert(got(6L)._2 == 0L)
    assert(!got.exists { case (id, (seq, _, _)) => id != 6L && seq == got(6L)._1 },
      "oversized doc must occupy its bin alone")
    // perfect fill on the three paired bins: each 300 shares a bin with a 212
    val binTok = got.filter(_._1 != 6L).values.map(v => v._1 -> v._3).toMap
    assert(binTok.values.forall(_ == 512L), s"paired bins must fill exactly: $binTok")
    // the stats row records the delta vs concat-chunk
    val stats = ext.Pipeline.packFitStats(
      counts.select(org.apache.spark.sql.functions.lit("s").as("source"),
        $"doc_id", $"n_tokens")).collect().head
    assert(stats.getAs[Long]("n_straddled_fit") == 1L,   // only the oversized loner
      s"fit straddles: $stats")
    assert(stats.getAs[Long]("n_straddled_concat") >= 2L, s"concat must split docs: $stats")
    assert(stats.getAs[Long]("fill_fit_e6") >= stats.getAs[Long]("fill_concat_e6"),
      s"FFD fill must not lose to concat-chunk: $stats")
  }

  test("epoch mix: tiny source hits the 4-epoch cap; dominant source gets whole epochs + remainder") {
    import spark.implicits._
    def doc(src: String, id: Long, n: Int) = (id, (1 to n).map(i => s"w$i").mkString(" "), src)
    // small = 1 doc x 4 tokens, big = 60 docs x 100 tokens (total 6000):
    // isqrt weights 2 / 77, wsum 79, corpus 6004, budget 3x = 18012 ->
    // target_small = 456 -> 114 epochs, CAPPED at 4, remainder zeroed;
    // target_big = 17556 -> 2 full epochs + rem 926000/1e6
    val docs = (Seq(doc("small", 1000L, 4)) ++
      (0L until 60L).map(i => doc("big", i, 100)))
      .toDF("doc_id", "text", "source")
    val got = ext.Pipeline.epochMix(docs).collect()
      .map(r => r.getLong(1) -> ((r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(9)))).toMap
    val (tS, fS, rS, nS) = (got(1000L)._1, got(1000L)._2, got(1000L)._3, got(1000L)._4)
    assert((tS, fS, rS, nS) == ((456L, 4L, 0L, 4L)), s"capped source: ${got(1000L)}")
    val (tB, fB, rB, _) = (got(0L)._1, got(0L)._2, got(0L)._3, got(0L)._4)
    assert((tB, fB, rB) == ((17556L, 2L, 926000L)), s"dominant source: ${got(0L)}")
    // every big-source doc repeats 2 or 3 times; remainder draws land both ways
    val copies = got.filter(_._1 != 1000L).values.map(_._4).toSet
    assert(copies == Set(2L, 3L), s"remainder must split the draws: $copies")
  }

  test("epoch mix: a below-proportional large source lands in the fractional (0-epoch) regime") {
    import spark.implicits._
    def doc(src: String, id: Long, n: Int) = (id, (1 to n).map(i => s"w$i").mkString(" "), src)
    // budgetX = 1 with 4 small sources whose sqrt-weights together double
    // the large source's: large source target (533) < its total (800) ->
    // zero whole epochs, purely down-sampled at 666250/1e6; small sources
    // get exactly 1 full epoch + 330000/1e6 remainder
    val docs = ((0L until 8L).map(i => doc("large", i, 100)) ++
      (0 until 4).flatMap(s => (0L until 2L).map(i => doc(s"s$s", 100L + s * 10 + i, 100))))
      .toDF("doc_id", "text", "source")
    val got = ext.Pipeline.epochMix(docs, budgetX = 1L).collect()
      .map(r => (r.getString(0), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got.contains(("large", 533L, 0L, 666250L)), s"large source regime: $got")
    assert(got.contains(("s0", 266L, 1L, 330000L)), s"small source regime: $got")
  }

  test("span corruption (token-ID grain): splicing targets back reconstructs the encoding") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    val rules = ext.TextOps.bpeTrain(docs)
    val encoded = ext.TextOps.bpeEncodeDocs(docs, ext.TextOps.bpeApply(docs, rules))
    val orig = encoded.collect().map(r =>
      r.getLong(0) -> r.getAs[String]("token_ids")).toMap
    val vmax = orig.values.flatMap(_.split(" ")).map(_.toLong).max
    val rows = ext.Pipeline.spanCorruptBpe(encoded).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getString(6), r.getString(7)))).toMap
    assert(rows.keySet == orig.keySet, "one row per encoded doc")
    for ((id, (nm, inp, tgt)) <- rows) {
      // sentinels are exactly the reserved IDs past the vocab: vmax+1+j
      val spans = scala.collection.mutable.Map[Long, List[String]]()
      var cur = -1L
      tgt.split(" ").filter(_.nonEmpty).foreach { tok =>
        val v = tok.toLong
        if (v > vmax) { cur = v; spans(cur) = Nil }
        else spans(cur) = spans(cur) :+ tok
      }
      assert(spans.size == nm, s"doc $id: ${spans.size} spans vs $nm masked")
      assert(spans.keySet.forall(s => s > vmax && s <= vmax + 1 + nm),
        s"doc $id: sentinel ids must be the reserved range: ${spans.keySet}")
      val rebuilt = inp.split(" ").filter(_.nonEmpty).flatMap { tok =>
        if (tok.toLong > vmax) spans(tok.toLong) else Seq(tok)
      }.mkString(" ")
      assert(rebuilt == orig(id), s"doc $id does not reconstruct at the ID grain")
    }
  }

  test("long-run scrub: removes the wholesale copy, keeps short boilerplate the full scrub strips") {
    import spark.implicits._
    def words(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val longBlock = words("c", 60)
    val shortA = words("a", 10)
    val docs = Seq(
      (0L, s"${words("u", 12)} $longBlock ${words("v", 12)}"),
      (1L, s"${words("x", 12)} $longBlock ${words("y", 12)}"),
      (2L, s"$shortA ${words("p", 15)}"),
      (3L, s"$shortA ${words("r", 15)}"))
      .toDF("doc_id", "text")
    val got = ext.Dedup.scrubLongRuns(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getString(7)))).toMap
    // docs 0/1: the 60-token run is removed, the unique flanks survive
    assert(got(0L) == ((1L, 60L, s"${words("u", 12)} ${words("v", 12)}")), s"${got(0L)}")
    assert(got(1L)._1 == 1L && got(1L)._2 == 60L)
    // docs 2/3: the 10-token duplicated block is BELOW the gate — text
    // passes through unchanged, where the full scrub strips it
    assert(got(2L) == ((0L, 0L, s"$shortA ${words("p", 15)}")), s"${got(2L)}")
    val full = ext.Dedup.scrubSpans(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(full(2L) == 10L, s"the full scrub must strip the short block: $full")
  }

  test("tokenizer fertility: a longer-word language pays more tokens per word") {
    import spark.implicits._
    // lang A repeats two short words (one merge covers them); lang B's
    // words are long and unique, so they stay many symbols after the same
    // merge budget -> strictly higher tokens-per-word
    val docs = Seq(
      (0L, "aa bb aa bb aa bb", "A"),
      (1L, "aa bb aa bb", "A"),
      (2L, "qwxyzkj mnpvtr qwxyzkj", "B"),
      (3L, "zzkwvpq rstuvnm", "B"))
      .toDF("doc_id", "text", "lang")
    val rules = ext.TextOps.bpeTrain(docs)
    val enc = ext.TextOps.bpeEncodeDocs(docs, ext.TextOps.bpeApply(docs, rules))
    val fert = docs.select($"doc_id", $"lang")
      .join(enc.select($"doc_id", $"n_words", $"n_tokens"), Seq("doc_id"))
      .groupBy($"lang")
      .agg(sum($"n_words").as("w"), sum($"n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(2) * 1000000L / r.getLong(1))).toMap
    assert(fert("B") > fert("A"),
      s"long unique words must cost more tokens per word: $fert")
  }

  test("dup run length: one long run vs scattered short runs; totals match the scrub") {
    import spark.implicits._
    def words(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val longBlock = words("c", 60)      // one 60-token copied block
    val shortA = words("a", 10)         // three scattered 10-token blocks
    val shortB = words("b", 10)
    val shortC = words("d", 10)
    val docs = Seq(
      (0L, s"${words("u", 12)} $longBlock ${words("v", 12)}"),
      (1L, s"${words("x", 12)} $longBlock ${words("y", 12)}"),
      (2L, s"$shortA ${words("p", 15)} $shortB ${words("q", 15)} $shortC"),
      (3L, s"$shortA ${words("r", 15)} $shortB ${words("s", 15)} $shortC"))
      .toDF("doc_id", "text")
    val got = ext.Dedup.dupRunLength(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // docs 0/1: exactly one 60-token run -> wholesale-copy verdict
    assert(got(0L) == ((1L, 60L, 60L, 1L)), s"long run: ${got(0L)}")
    assert(got(1L) == ((1L, 60L, 60L, 1L)), s"long run: ${got(1L)}")
    // docs 2/3: three scattered 10-token runs, none >= 50 -> no verdict
    assert(got(2L) == ((3L, 10L, 30L, 0L)), s"scattered runs: ${got(2L)}")
    assert(got(3L)._4 == 0L, s"scattered runs must not flag: ${got(3L)}")
    // dup_tokens IS the scrub's n_removed (one shared duplicated-set definition)
    val removed = ext.Dedup.scrubSpans(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.forall { case (id, (_, _, dup, _)) => dup == removed(id) },
      s"dup_tokens must equal scrub n_removed: $got vs $removed")
  }
}
