package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Hashing}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("minhash LSH finds exactly the high-jaccard planted pairs") {
    // Ground truth: brute-force exact jaccard over all pairs at 0.8.
    val sh = Tables.documents(spark, sf).select($"doc_id",
      Hashing.shingleHashes(Hashing.wordHashes($"text"), 3).as("sh"))
    val a = sh.select($"doc_id".as("da"), $"sh".as("sha"))
    val b = sh.select($"doc_id".as("db"), $"sh".as("shb"))
    val inter = size(array_intersect($"sha", $"shb"))
    val uni = size($"sha") + size($"shb") - inter
    val truth = a.crossJoin(b).filter($"da" < $"db")
      .withColumn("jac", inter.cast("double") / uni.cast("double"))
      .filter($"jac" >= 0.8)
      .select($"da", $"db").as[(Long, Long)].collect().toSet

    val lsh = Dedup.minhashLsh(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    // At jaccard ≈ 0.98 the 4x4 banding captures with prob ~1-1e-7:
    // on this corpus LSH must equal the exact truth set.
    assert(lsh == truth)
    assert(lsh.nonEmpty, "corpus has planted near-dup pairs")
  }

  test("simhash: near-dup pairs have small hamming distance") {
    val sims = Dedup.simhash(spark, sf).as[(Long, Long)].collect().toMap
    val pairs = Dedup.minhashLsh(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val planted = pairs.map { case (x, y) =>
      java.lang.Long.bitCount(sims(x) ^ sims(y))
    }
    // 31-bit simhash: planted near-dups ≤ 8 bits apart...
    assert(planted.forall(_ <= 8), s"planted hamming: ${planted.toSeq}")
    // ...and clearly closer than random pairs. (This corpus shares one
    // tiny vocabulary, so even random pairs sit ~6 bits apart — the
    // discriminating signal is the planted-vs-random gap, not an
    // absolute threshold.)
    val rnd = new scala.util.Random(1)
    val ids = sims.keys.toArray
    val randomAvg = (1 to 1000).map { _ =>
      java.lang.Long.bitCount(sims(ids(rnd.nextInt(ids.length))) ^
        sims(ids(rnd.nextInt(ids.length))))
    }.sum / 1000.0
    val plantedAvg = planted.map(_.toDouble).sum / planted.length
    assert(plantedAvg < randomAvg / 2,
      s"planted avg $plantedAvg vs random avg $randomAvg")
  }

  test("simhash hamming: banded search == brute force at radius 3 (recall 1)") {
    // In-engine twin of the oracle's proof: the pigeonhole band join
    // must reproduce the all-pairs brute force exactly on the corpus.
    val sig = Dedup.simhash62(spark, sf).as[(Long, Long)].collect()
    val truth = (for {
      (a, sa) <- sig; (b, sb) <- sig if a < b
      d = java.lang.Long.bitCount(sa ^ sb) if d <= Dedup.HammingRadius
    } yield (a, b, d.toLong)).toSet
    val got = Dedup.simhashHamming(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == truth)
  }

  test("simhash hamming: planted signatures — boundary, multi-band, miss") {
    // Base signature plus: dist 0 (identical), dist 3 (= radius, bits
    // spread over three different bands), dist 4 (one past radius —
    // must NOT appear even though it matches three of four bands).
    val base = 0x2AAAAAAAAAAAAAAL & ((1L << 62) - 1)
    val sig = Seq(
      1L -> base,
      2L -> base,                                   // dist 0
      3L -> (base ^ (1L << 1) ^ (1L << 33)),        // dist 2, two bands hit
      4L -> (base ^ (1L << 0) ^ (1L << 20) ^ (1L << 40)), // dist 3 exactly
      5L -> (base ^ 0xFL)                           // dist 4: excluded
    ).toDF("doc_id", "simhash")
    val got = Dedup.hammingPairsOf(sig)
      .as[(Long, Long, Long)].collect().toSet
    val truth = (for {
      (a, sa) <- sig.as[(Long, Long)].collect()
      (b, sb) <- sig.as[(Long, Long)].collect() if a < b
      d = java.lang.Long.bitCount(sa ^ sb) if d <= Dedup.HammingRadius
    } yield (a, b, d.toLong)).toSet
    assert(got == truth)
    assert(got.contains((1L, 2L, 0L)) && got.contains((1L, 4L, 3L)))
    assert(!got.exists { case (a, b, _) => (a, b) == ((1L, 5L)) },
      "dist-4 pair must be excluded")
    // A dist-0 pair collides in all four bands — distinct must collapse
    // the four collisions to ONE output row (checked by set equality
    // above plus an explicit count here).
    assert(Dedup.hammingPairsOf(sig).count() == got.size)
  }

  test("sorted neighborhood: window pairs match an independent fold") {
    // Hand signatures whose sort order is obvious; window W=4 → pairs
    // within rank gap ≤ 3, verified at hamming ≤ 3. Signatures 10/11/12
    // sort adjacently and are 1-2 bits apart (found); 900 is far in
    // both rank and bits; 13 is rank-adjacent but 5 bits from 12
    // (candidate, killed by verify).
    val sig = Seq(
      1L -> 0x10L, 2L -> 0x11L, 3L -> 0x13L,
      4L -> 0x1F42L, 5L -> 0x900000L).toDF("doc_id", "simhash")
    val rows = sig.as[(Long, Long)].collect().sortBy(s => (s._2, s._1))
    val want = (for {
      i <- rows.indices; j <- (i + 1) until math.min(i + 4, rows.length)
      d = java.lang.Long.bitCount(rows(i)._2 ^ rows(j)._2) if d <= 3
    } yield (rows(i)._1, rows(j)._1, d.toLong, (j - i).toLong)).toSet
    val got = Dedup.snmPairsOf(sig)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.contains((1L, 2L, 1L, 1L)) && got.contains((1L, 3L, 2L, 2L)))
    assert(!got.exists { case (_, b, _, _) => b == 4L },
      "0x1F42 is rank-adjacent but 5+ bits away — verify must kill it")
  }

  test("hamming + snm: empty and singleton signature frames yield no pairs") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "simhash")
    assert(Dedup.hammingPairsOf(empty).collect().isEmpty)
    assert(Dedup.snmPairsOf(empty).collect().isEmpty)
    val one = Seq(1L -> 42L).toDF("doc_id", "simhash")
    assert(Dedup.hammingPairsOf(one).collect().isEmpty)
    assert(Dedup.snmPairsOf(one).collect().isEmpty)
  }

  test("sorted neighborhood: partition invariance and recall vs banded truth") {
    val a = Dedup.sortedNeighborhood(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val b = Dedup.sortedNeighborhood(spark, sf).collect()
        .map(_.toString).sorted.toSeq
      assert(a == b, "distributed rank must not depend on parallelism")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // SNM pairs are a SUBSET of the banded recall-1 truth at the same
    // radius (same verify, heuristic candidates) — measured, not
    // claimed. SNM orders pairs by rank (sort-key order), banded by
    // doc_id: normalize both to unordered pairs first.
    def unordered(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"doc_a", $"doc_b").as[(Long, Long)].collect()
        .map { case (x, y) => (math.min(x, y), math.max(x, y)) }.toSet
    val truth = unordered(Dedup.simhashHamming(spark, sf))
    val snmPairs = unordered(Dedup.sortedNeighborhood(spark, sf))
    assert(snmPairs.subsetOf(truth))
  }

  test("exact dedup groups identical texts") {
    val docs = Tables.documents(spark, sf)
    val doubled = docs.unionAll(docs.withColumn("doc_id", $"doc_id" + 1000000))
    val grouped = doubled.groupBy(md5($"text").as("h"))
      .agg(count(lit(1)).as("cnt"), min($"doc_id").as("keeper"))
    val rows = grouped.as[(String, Long, Long)].collect()
    assert(rows.forall(_._2 == 2)) // every text now appears exactly twice
    assert(rows.forall(_._3 < 1000000)) // keeper is always the original
  }

  test("shingleHashes: empty/short texts yield empty set, no crash") {
    val df = Seq("", "one two", "one two three four").toDF("text")
      .select(Hashing.shingleHashes(Hashing.wordHashes($"text"), 3).as("sh"))
    val sizes = df.select(size($"sh")).as[Int].collect().toSeq
    assert(sizes == Seq(0, 0, 2))
  }

  test("LSH calibration: pair count exact, identical docs always collide") {
    val cal = Dedup.lshCalibration(spark, sf)
      .as[(Long, Long, Long)].collect()
    // The cells partition all C(n,2) sample pairs exactly once.
    val n = 192L
    assert(cal.map(_._3).sum == n * (n - 1) / 2)
    // Identical shingle sets (decile 10) have identical signatures — they
    // MUST band-collide: the (10, non-candidate) cell cannot exist.
    assert(!cal.exists(c => c._1 == 10 && c._2 == 0),
      "an identical pair failed to band-collide")
    // The corpus's near-dup pairs (decile >= 8; no exact dups exist in
    // the synthetic table) land in the sample and the banding catches
    // at least one of them — the S-curve's recall shoulder is measured
    // on real pairs, not asserted from theory.
    assert(cal.exists(c => c._1 >= 8 && c._2 == 1),
      s"no high-jaccard pair band-collided: ${cal.sortBy(_._1).toSeq}")
    // Unrelated pairs dominate and mostly do not collide.
    val zeroNon = cal.filter(c => c._1 == 0 && c._2 == 0).map(_._3).sum
    assert(zeroNon * 10 >= cal.map(_._3).sum * 8)
  }

  test("prefix-filter join == brute force over ALL pairs (recall 1)") {
    val vecs = Tables.documents(spark, sf).select($"doc_id",
      Hashing.shingleHashes(Hashing.wordHashes($"text"), 3).as("sh"))
      .as[(Long, Array[Long])].collect().filter(_._2.nonEmpty)
    val truth = (for {
      (da, sa) <- vecs; (db, sb) <- vecs if da < db
      inter = sa.intersect(sb).length.toLong
      uni = sa.length + sb.length - inter
      if inter * 1000 >= 800 * uni
    } yield (da, db, inter, uni, inter * 1000 / uni)).toSet
    val got = Dedup.jaccardPrefixJoin(spark, sf)
      .select($"doc_a", $"doc_b", $"inter", $"uni", $"jac_permille")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == truth)
    assert(got.nonEmpty, "corpus has planted near-dup pairs")
  }

  test("prefix-filter join: integer threshold boundary is inclusive") {
    // Boundary pair: |A|=|B|=9, 8 shared -> inter=8, uni=10,
    // 8*1000 == 800*10 exactly. Below pair: 7 shared -> uni=11, out.
    // Disjoint pair: never a candidate.
    def s(xs: Long*): Array[Long] = xs.toArray.sorted
    val sh = Seq(
      1L -> s(1, 2, 3, 4, 5, 6, 7, 8, 9),
      2L -> s(1, 2, 3, 4, 5, 6, 7, 8, 10),     // J = 8/10 = boundary
      3L -> s(1, 2, 3, 4, 5, 6, 7, 11, 12),    // vs 1: 7/11 < 0.8
      4L -> s(100, 101, 102, 103, 104, 105, 106, 107, 108))
      .toDF("doc_id", "sh")
    val got = Dedup.jaccardPrefixOf(sh, 800L)
      .select($"doc_a", $"doc_b", $"jac_permille")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 800L)))
    // At a lower threshold the sub-boundary pairs appear too.
    val loose = Dedup.jaccardPrefixOf(sh, 600L)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(loose == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("containment join catches small-inside-big pairs Jaccard misses") {
    def s(xs: Long*): Array[Long] = xs.toArray.sorted
    // Doc 1 (10 tokens) fully inside doc 2 (40 tokens): containment
    // 1000, Jaccard 10/40 = 0.25 — invisible to the >= 0.8 Jaccard
    // join. Doc 3 shares 8/10 of doc 1 (below the 0.9 containment
    // bar); doc 4 disjoint.
    val sh = Seq(
      1L -> s(1L to 10L: _*),
      2L -> s(1L to 40L: _*),
      3L -> s((1L to 8L) ++ Seq(90L, 91L): _*),
      4L -> s(100L to 120L: _*))
      .toDF("doc_id", "sh")
    val got = Dedup.containmentOf(sh, 900L)
      .select($"doc_a", $"doc_b", $"cont_permille")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1000L)))
    // The same family through the Jaccard prefix join: NOTHING.
    assert(Dedup.jaccardPrefixOf(sh, 800L).count() == 0)
    // Exact duplicates contain each other: both ordered pairs appear.
    val dup = Seq(7L -> s(1, 2, 3, 4, 5), 8L -> s(1, 2, 3, 4, 5))
      .toDF("doc_id", "sh")
    val both = Dedup.containmentOf(dup, 900L)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(both == Set((7L, 8L), (8L, 7L)))
  }

  test("boilerplate token never detonates the prefix candidate stage") {
    // 100 docs sharing ONE universal token plus 9 unique tokens each: a
    // raw token join pays C(100,2) = 4950 pairs through the universal
    // token; the rarest-first prefix (df asc) takes each doc's 3 unique
    // rarest, so BOTH candidate stages must build zero pairs.
    def doc(i: Long): (Long, Array[Long]) =
      (i, (Array(1L) ++ (0 until 9).map(j => 1000L + i * 16 + j)).sorted)
    val sh = (1L to 100L).map(doc).toDF("doc_id", "sh")
    assert(Dedup.prefixCandidatesOf(sh, 800L).count() == 0L)
    assert(Dedup.containCandidatesOf(sh, 900L).count() == 0L)
    // Control: the same family with a genuinely contained doc — only
    // that doc's pairs appear, not the boilerplate cross product.
    val withDup = sh.unionAll(Seq(
      (999L, (1L to 5L).map(j => 1000L + 16 + j - 1).toArray)) // ⊂ doc 1
      .toDF("doc_id", "sh"))
    val cands = Dedup.containCandidatesOf(withDup, 900L)
      .as[(Long, Long)].collect().toSet
    assert(cands.nonEmpty && cands.forall(p => p._1 == 999L || p._2 == 999L),
      s"unexpected candidates: $cands")
    val found = Dedup.containmentOf(withDup, 900L)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(found == Set((999L, 1L)))
  }

  test("containment join == brute force over all ordered pairs") {
    val vecs = Tables.documents(spark, sf).select($"doc_id",
      Hashing.shingleHashes(Hashing.wordHashes($"text"), 3).as("sh"))
      .as[(Long, Array[Long])].collect().filter(_._2.nonEmpty)
    val truth = (for {
      (da, sa) <- vecs; (db, sb) <- vecs if da != db
      inter = sa.intersect(sb).length.toLong
      if inter * 1000 >= 900 * sa.length
    } yield (da, db, inter, sa.length.toLong, sb.length.toLong,
      inter * 1000 / sa.length)).toSet
    val got = Dedup.containmentJoin(spark, sf)
      .select($"doc_a", $"doc_b", $"inter", $"n_a", $"n_b", $"cont_permille")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == truth)
    assert(got.nonEmpty, "corpus has planted duplicate pairs")
  }
}
