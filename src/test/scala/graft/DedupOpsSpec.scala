package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.DedupOps

class DedupOpsSpec extends SparkTestBase {

  private def q(name: String) =
    DedupOps.all.find(_.name == name).get.run(spark, sfDir)

  test("exact dedup maps every doc, survivors are self-canonical") {
    val d = q("q34_dedup_exact")
    assert(d.count() == Tables.documents(spark, sfDir).count())
    assert(d.filter(col("canon_id") > col("doc_id")).isEmpty)
    assert(d.filter(col("is_dup") === 0 && col("canon_id") =!= col("doc_id")).isEmpty)
  }

  test("source overlap: crafted shared 5-grams count once per (pair, gram)") {
    import spark.implicits._
    val d = Seq(
      // A and B share exactly the 5-gram "a b c d e" (B offsets it);
      // A's own repetition of the gram across two docs must not
      // double-count (distinct (source, h))
      (1L, "a b c d e x", "A"),
      (2L, "y a b c d e", "A"),
      (3L, "z a b c d e", "B"),
      // C shares nothing 5 words long
      (4L, "q w e r t", "C"))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("q89").toString
    d.withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = DedupOps.all.find(_.name == "q89_source_overlap").get
      .run(spark, dir)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r == Map(("A", "B") -> 1L), s"$r")
  }

  test("cdc chunks: shared passages align at any offset; edits stay local") {
    import spark.implicits._
    import graft.operators.Dedup
    val rnd = new scala.util.Random(3)
    def words(n: Int, tag: String) = Seq.fill(n)(s"$tag${rnd.nextInt(100000)}")
    val shared = words(120, "s").mkString(" ")
    val a = (words(15, "a") :+ shared).mkString(" ")
    val b = (words(40, "b") :+ shared).mkString(" ") // different offset
    val c = words(150, "c").mkString(" ")            // unrelated
    val d3 = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val r = Dedup.cdcChunkStats(d3).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // content-defined boundaries re-align inside the shared passage
    // whatever the prefix length: both carriers see duplicated chunks
    assert(r(1L)._2 > 0 && r(2L)._2 > 0, s"shared passage not aligned: $r")
    assert(r(3L)._2 == 0, s"unrelated doc flagged: $r")
    // edit locality: flipping ONE mid-document word changes at most
    // the chunks adjacent to it (boundary-stability), not the tail
    val aw = a.split(" ")
    val edited = (aw.take(60) ++ Array("EDIT") ++ aw.drop(61)).mkString(" ")
    val chunksOf = (t: String) => Dedup.cdcChunkStats(
      Seq((1L, t), (99L, "zz")).toDF("doc_id", "text"))
      .filter(col("doc_id") === 1L).collect()(0).getLong(1)
    val pair = Dedup.cdcChunkStats(
      Seq((1L, a), (2L, edited)).toDF("doc_id", "text")).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    // the two versions still share almost every chunk: non-dup
    // chunks on each side are a small constant, not O(doc)
    val nA = chunksOf(a)
    assert(pair(1L) >= nA - 2, s"edit was not local: ${pair(1L)} of $nA chunks shared")
  }

  test("incremental dedup: delta survivors are first-in-delta and unseen-in-base") {
    import spark.implicits._
    val base = Seq((0L, "seen before", "s")).toDF("doc_id", "text", "source")
    val delta = Seq(
      (1L, "seen  before", "s"),  // fp-equal to base -> dropped
      (3L, "fresh text", "s"),    // first in delta -> kept
      (5L, "fresh text", "s"),    // dup within delta -> dropped
      (7L, "alone", "s"))         // kept
      .toDF("doc_id", "text", "source")
    val got = graft.operators.Dedup.incrementalSurvivors(base, delta)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(3L, 7L), s"survivors: $got")
  }

  test("diversity MIS equals sequential greedy by salted priority; independent, maximal, partition-stable") {
    import spark.implicits._
    import graft.operators.Diversity
    // crafted graph: a 3-clique {1,2,3}, a path 10-11-12-13, an edge
    // {20,21}, and isolated doc 30 (no pair)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L),
      (11L, 12L), (12L, 13L), (20L, 21L)).toDF("a", "b")
    val nodes = pairs.select(col("a")).unionAll(pairs.select(col("b")))
      .distinct().as[Long].collect().toSet
    val adj = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (11L, 12L),
      (12L, 13L), (20L, 21L)).flatMap { case (x, y) => Seq(x -> y, y -> x) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // reference: sequential greedy in (salted-md5-priority, id) order
    def pri(n: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"42:$n".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map(b => f"$b%02x").mkString, 16)
    }
    val expected = nodes.toSeq.sortBy(n => (pri(n), n))
      .foldLeft(Set.empty[Long]) { (sel, n) =>
        if (adj(n).exists(sel)) sel else sel + n
      }
    val got = Diversity.independentSet(pairs).as[Long].collect().toSet
    assert(got == expected, s"MIS $got != greedy $expected")
    // independence + maximality, asserted structurally too
    assert(!got.exists(n => adj(n).exists(got)), "kept an edge")
    assert((nodes -- got).forall(n => adj(n).exists(got)), "not maximal")
    // clique keeps exactly one
    assert(got.count(Set(1L, 2L, 3L)) == 1)
    // survivors: dropped docs are exactly graph minus MIS; isolated pass
    val docs = nodes.toSeq.appended(30L).map(n => (n, s"t$n")).toDF("doc_id", "text")
    val kept = Diversity.diversitySurvivors(docs, pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == got + 30L, s"survivors $kept")
    // partitioning must not change the result
    val re = Diversity.independentSet(pairs.repartition(5)).as[Long].collect().toSet
    assert(re == got, "MIS changed under repartitioning")
  }

  test("sketch distinct counts track the exact counts within the HLL error contract") {
    import graft.operators.Sketches
    val d = Tables.documents(spark, sfDir)
    val exact = Sketches.distinctBySource(d).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val est = Sketches.approxDistinctBySource(d, rsd = 0.05).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(est.keySet == exact.keySet)
    for ((s, e) <- exact) {
      val rel = math.abs(est(s) - e).toDouble / math.max(1L, e)
      assert(rel <= 0.15, s"source $s: est ${est(s)} vs exact $e (rel $rel)")
    }
    // sketch merges are commutative: a different partitioning must
    // not change the estimate
    val re = Sketches.approxDistinctBySource(d.repartition(7), rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(re == est, "estimate changed under repartitioning")
  }

  test("corpus profile: exact histogram quantiles on a hand corpus") {
    import spark.implicits._
    import graft.queries.DatasetOps
    // 4 docs, chars lengths 1,2,3,10: n=4, thresholds 100cum>=p*4:
    // p25 -> cum>=1 -> 1; p50 -> cum>=2 -> 2; p75 -> cum>=3 -> 3;
    // p95 -> 100cum>=380 -> cum>=4 -> 10
    val dir = java.nio.file.Files.createTempDirectory("q88").toString
    Seq((1L, "a", "s", 1L), (2L, "bb", "s", 2L), (3L, "ccc", "s", 3L),
      (4L, "dddddddddd", "s", 10L))
      .toDF("doc_id", "text", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = DatasetOps.all.find(_.name == "q88_corpus_profile").get
      .run(spark, dir)
      .filter(col("metric") === "chars").collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)) ==
      ((4L, 1L, 1L, 2L, 3L, 10L, 10L, 16L)), s"$r")
  }

  test("minhash-LSH candidates contain every high-Jaccard pair (recall on planted dups)") {
    val jacc = q("q35_dedup_jaccard").select(col("a"), col("b"))
    val mh = q("q36_dedup_minhash").select(col("a"), col("b"))
    // With 8 bands x 4 rows, P(miss | j >= 0.9) ≈ (1 - 0.9^4)^8 < 0.02
    // per pair; on the planted near-identical pairs recall is total.
    assert(jacc.except(mh).isEmpty, "LSH missed a >=0.5-Jaccard pair")
  }

  test("minhash signature similarity is within [0,1] and wide for dup pairs") {
    val mh = q("q36_dedup_minhash")
    assert(mh.filter(col("sim_est") < 0 || col("sim_est") > 1).isEmpty)
  }

  test("simhash multi-band finds EVERY planted near-dup pair (sf0.01, the oracle scale)") {
    // strict recall at the DRIVER GATE's scale: the single-prefix-band
    // predecessor missed ~half of low-hamming pairs (any flip inside
    // the prefix hid the pair); block-pair banding finds all 25
    // planted pairs (max hamming 9 — beyond the hamming-6 pigeonhole
    // guarantee, but every planted pair still leaves >=1 clean block
    // pair). sf0.001 is NOT used here: its doc texts are so short that
    // one planted pair's vote margins degrade to hamming 11 touching
    // nearly every block — no practical banding catches that; the
    // maxHamming=12 reporting window is documented as probabilistic
    // past hamming 6.
    val dir = "/root/testdata/sf0.01"
    def run(name: String) = DedupOps.all.find(_.name == name).get.run(spark, dir)
    val sh = run("q37_dedup_simhash")
    assert(sh.filter(col("hamming") > 12).isEmpty)
    val jacc = run("q35_dedup_jaccard").select(col("a"), col("b"))
    assert(jacc.except(sh.select(col("a"), col("b"))).isEmpty,
      "multi-band simhash missed a planted near-dup pair")
  }

  test("simhash block-pair banding guarantees hamming<=6 recall, incl. old-prefix straddlers") {
    import spark.implicits._
    // block layout: widths 8,8,8,8,7,7,7,7 → shifts 0,8,16,24,32,39,46,53
    val h0 = 0x0ABCDEF123456789L & ((1L << 60) - 1)
    // adversarial for the retired single-prefix scheme: both flips land
    // in the former top-16-bit prefix (bits 44..59 → blocks 5 and 7
    // here), so prefix-bucketing NEVER compared the pair; blocks
    // 0-4 and 6 stay clean → many clean pairs remain
    val adversarial = h0 ^ (1L << 58) ^ (1L << 45)
    // pigeonhole cases: <=6 flips dirty at most 6 of 8 blocks, so a
    // clean PAIR of blocks always survives — here blocks {2,7} stay
    // clean with 6 flips spread over blocks 0,1,3,4,5,6
    val spread6 = h0 ^ (1L << 3) ^ (1L << 14) ^ (1L << 27) ^ (1L << 33) ^ (1L << 41) ^ (1L << 48)
    val spread2 = h0 ^ (1L << 16) ^ (1L << 59)
    // boundary: 7 flips in 7 distinct blocks — only ONE clean block
    // left, no clean pair, missed BY DESIGN (the guarantee limit)
    val sevenBlocks = h0 ^ (1L << 1) ^ (1L << 11) ^ (1L << 21) ^ (1L << 31) ^
      (1L << 33) ^ (1L << 41) ^ (1L << 48)
    val base = Seq(1L -> h0, 2L -> adversarial, 3L -> spread6, 4L -> spread2, 5L -> sevenBlocks)
      .toDF("doc_id", "simhash")
    val got = Dedup.simhashPairs(base).select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.contains(1L -> 2L), "hamming-2 pair straddling the old prefix was missed")
    assert(got.contains(1L -> 3L), "hamming-6 pair spread over 6 blocks was missed")
    assert(got.contains(1L -> 4L), "hamming-2 pair spread over 2 blocks was missed")
    assert(!got.contains(1L -> 5L), "pair dirtying 7 blocks should be outside the guarantee")
  }

  test("first-match ownership emits each pair exactly once == emit-everywhere + distinct") {
    import spark.implicits._
    // random near-ish corpus: clusters around a few base hashes so
    // pairs collide in MANY tables (the duplication the ownership rule
    // exists to kill), plus unrelated hashes
    val rnd = new scala.util.Random(42)
    val bases = Seq.fill(5)(rnd.nextLong() & ((1L << 60) - 1))
    val rows = (1L to 120L).map { id =>
      val h =
        if (id <= 100) {
          val b = bases((id % 5).toInt)
          (0 until rnd.nextInt(8)).foldLeft(b)((x, _) => x ^ (1L << rnd.nextInt(60)))
        } else rnd.nextLong() & ((1L << 60) - 1)
      id -> h
    }
    val base = rows.toDF("doc_id", "simhash")
    val got = Dedup.simhashPairs(base).as[(Long, Long, Int)].collect()
    assert(got.length == got.toSet.size, "a pair was emitted from more than one table")
    // reference: emit from every colliding table, then distinct
    val hs = rows.toMap
    val expect = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      m = ha ^ hb
      clean = Dedup.SimBlockWidths.indices.count(k =>
        (m >>> Dedup.SimBlockShifts(k)) % (1L << Dedup.SimBlockWidths(k)) == 0L)
      if clean >= 2 && java.lang.Long.bitCount(m) <= 12
    } yield (a, b, java.lang.Long.bitCount(m))).toSet
    assert(got.toSet == expect, "ownership pair set differs from the distinct reference")
  }

  test("decontamination flags exactly the docs sharing a benchmark n-gram") {
    import spark.implicits._
    val benchPhrase = "the quick brown fox jumps over it"
    val docs = Seq(
      (1L, benchPhrase),                                // benchmark
      (2L, "totally unrelated benchmark question here"), // benchmark
      (10L, s"padding words then $benchPhrase and more"), // contaminated
      (11L, "clean document with no overlap at all whatsoever"),
      (12L, "the quick brown dog jumps over it")        // 4-gram overlap only
    ).toDF("doc_id", "text")
    val got = Dedup.contaminated(docs, col("doc_id") < 10, n = 5)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(10L), s"flag set wrong: $got")
    // "the quick brown fox jumps over it" = 7 words -> 3 distinct
    // 5-grams, all present verbatim in doc 10
    assert(got(10L) == 3L)
  }

  test("simhash hot-bucket cap bounds candidates, keeps pairs with any cold clean table") {
    import spark.implicits._
    val h0 = 0x0ABCDEF123456789L & ((1L << 60) - 1)
    // a 50-member IDENTICAL-hash clique: every bucket it touches holds
    // 50 rows — the self-similar hot-bucket blow-up in miniature
    val clique = (100L until 150L).map(_ -> h0)
    // a planted near-pair OUTSIDE the clique (hamming 2, different
    // base hash): all its buckets are cold, must survive the cap
    val g0 = 0x0123456789ABCDEFL & ((1L << 60) - 1)
    val planted = Seq(1L -> g0, 2L -> (g0 ^ (1L << 3) ^ (1L << 58)))
    val base = (clique ++ planted).toDF("doc_id", "simhash")
    val capped = Dedup.simhashPairs(base, maxBucketPop = Some(10L))
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(capped.contains(1L -> 2L), "cold-bucket pair lost to the cap")
    assert(!capped.exists { case (a, b) => a >= 100L && b >= 100L },
      "clique pairs must be dropped: every clean table's bucket is hot")
    // uncapped emits the full quadratic clique (the contract the cap
    // exists to bound): C(50,2) + the planted pair
    val full = Dedup.simhashPairs(base).count()
    assert(full == 50L * 49 / 2 + 1)
    // cap high enough to keep the clique buckets -> identical pair SET
    // as ownership (the capped path dedups instead of owning)
    val loose = Dedup.simhashPairs(base, maxBucketPop = Some(100L))
      .select("a", "b").as[(Long, Long)].collect().toSet
    val owned = Dedup.simhashPairs(base)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(loose == owned, "loose cap must reproduce the ownership pair set")
  }

  test("q106 capped simhash is a subset of q37's pairs at hamming<=3") {
    val capped = q("q106_simhash_capped").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(capped.nonEmpty, "capped path found no pairs on the sf data")
    assert(capped.forall(_._3 <= 3))
    assert(capped.distinct.length == capped.length, "pair key duplicated")
    // every capped pair must appear in the uncapped listing with the
    // same hamming (the cap only ever DROPS pairs, never invents or
    // re-scores them)
    val full = q("q37_dedup_simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(_._3 <= 3).toSet
    assert(capped.forall(full.contains), "capped pair absent from q37")
  }

  test("embedding top-pairs are ordered by similarity and well-formed") {
    val p = q("q38_dedup_embedding").collect()
    assert(p.length > 0 && p.length <= 100)
    val sims = p.map(_.getDouble(2))
    assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)))
    assert(p.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("stop-shingle cap drops corpus-wide hot shingles and bounds candidate joins") {
    import spark.implicits._
    // every doc opens with the same 3-gram (one shingle in every doc —
    // the boilerplate-header skew case); tails are unique per doc
    val docs = (0 until 40)
      .map(i => (i.toLong, s"hot hot hot u${i}a u${i}b u${i}c u${i}d"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.shingleRows(docs)
    val capped = Dedup.shingleRows(docs, maxDocFreq = Some(4))
    assert(uncapped.filter(col("g") === "hot hot hot").count() == 40)
    assert(capped.filter(col("g") === "hot hot hot").isEmpty,
      "hot shingle survived the DF cap")
    // a shingle-keyed candidate join is all-pairs without the cap
    // (the hot bucket alone is n^2/2) and empty with it
    def candPairs(e: org.apache.spark.sql.DataFrame) =
      e.select(col("doc_id").as("a"), col("g"))
        .join(e.select(col("doc_id").as("b"), col("g")), Seq("g"))
        .filter(col("a") < col("b")).count()
    assert(candPairs(uncapped) == 40L * 39 / 2)
    assert(candPairs(capped) == 0)
  }

  test("shingled drops sub-n docs and emits distinct shingles") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, "a b c d"), (3L, "x x x x x")).toDF("doc_id", "text")
    val sh = Dedup.shingled(df, 3).select("doc_id", "sh").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(!sh.contains(1L))
    assert(sh(2L) == Seq("a b c", "b c d"))
    assert(sh(3L) == Seq("x x x"))
  }

  test("shingleRows (codegen path) produces the same shingle sets as shingled") {
    import org.apache.spark.sql.functions.explode
    val d = Tables.documents(spark, sfDir)
    val fromArrays = Dedup.shingled(d).select(col("doc_id"), explode(col("sh")).as("g"))
    val fromRows = Dedup.shingleRows(d)
    assert(fromArrays.except(fromRows).isEmpty && fromRows.except(fromArrays).isEmpty)
  }

  test("RollingHashes: rolling recurrence equals the direct polynomial sum on adversarial strings") {
    import spark.implicits._
    import graft.plans.RollingHashes.{B, M}
    val L = 5
    def direct(text: String): Seq[Long] = {
      val cps = text.codePoints().toArray.map(_.toLong)
      if (cps.length < L) Seq.empty
      else (0 to cps.length - L).map { i =>
        (0 until L).foldLeft(0L)((h, j) => (h * B + cps(i + j)) % M)
      }
    }
    val rnd = new scala.util.Random(61)
    // whole code points only (a .take on UTF-16 chars would split the
    // surrogate pair into an invalid lone surrogate no real corpus
    // contains)
    val alphabet = Vector("a", "b", " ", "日", "👍", "é")
    val texts = (1 to 200).map { _ =>
      val n = rnd.nextInt(14)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
    } :+ "" :+ "abcd" :+ "abcde" :+ "👍👍👍👍👍" :+ "aaaaaaaaaa"
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), graft.plans.RollingHashes(col("text"), L).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == direct(t), s"mismatch on '$t'")
    }
  }

  test("stripDupSpans: keep-first ownership cuts the span from later docs only") {
    import spark.implicits._
    val span = "the quick brown fox jumps over the lazy dog again and again!"
    val d = Seq(
      (1L, s"alphaQ${span}Womega"),            // global first: keeps it
      (2L, s"totally different prefixZ${span}Ksuffix"),
      (3L, s"thirdçcopy日${span}👍end"),        // multibyte around the span
      (4L, "no shared spans in this one at all just unique words qqq"))
      .toDF("doc_id", "text")
    val r = Dedup.stripDupSpans(d, 40).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == s"alphaQ${span}Womega", "owner doc must keep its span")
    assert(r(4L) == "no shared spans in this one at all just unique words qqq")
    // later docs lose exactly the covered region: every removed code
    // point lies in the span, no span chars survive
    assert(!r(2L).contains("quick brown") && r(2L).startsWith("totally different prefixZ")
      && r(2L).endsWith("Ksuffix"), s"doc2 surgery wrong: '${r(2L)}'")
    assert(r(3L).startsWith("thirdçcopy日") && r(3L).endsWith("👍end")
      && !r(3L).contains("lazy dog"), s"doc3 surgery wrong: '${r(3L)}'")
  }

  test("stripDupSpans: a hash COLLISION between different substrings cuts nothing") {
    import spark.implicits._
    // Engineered collider for the 2^40-range polynomial hash: raising
    // position 0 by 1 adds B^39, raising position 1 by B adds the same
    // B^39 — so these two DIFFERENT 40-char windows share rolling hash
    // 440698971042 (verified below against the production expression).
    val s1 = "b" + "a" * 39
    val s2 = "a" + new String(Character.toChars(97 + 1000003)) + "a" * 38
    val h1 = graft.plans.RollingHashes.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s1), 40)
    val h2 = graft.plans.RollingHashes.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s2), 40)
    assert(s1 != s2 && h1.toSeq == h2.toSeq,
      "collider constants drifted — rebuild them against RollingHashes")
    // hash-keyed surgery would see one cross-doc hash (nd=2), crown
    // doc 1 owner, and DELETE doc 2's unique text; the content-level
    // regroup must leave both untouched
    val d = Seq((1L, s1), (2L, s2)).toDF("doc_id", "text")
    val r = Dedup.stripDupSpans(d, 40).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == s1 && r(2L) == s2,
      s"collision caused a cut: $r")
  }

  test("decontaminateStrip: benchmark spans cut from training docs, clean text and colliders untouched") {
    import spark.implicits._
    val span = "the exact benchmark passage that must never leak into training"
    // the engineered collider pair (see the collision test above):
    // bench holds s1, a train doc holds s2 — same rolling hash,
    // different content, so only slice verification prevents a cut
    val s1 = "b" + "a" * 39
    val s2 = "a" + new String(Character.toChars(97 + 1000003)) + "a" * 38
    val d = Seq(
      (1L, s"benchmark leading text Q${span}W trailing $s1"),
      (50L, s"training doc contaminated X${span}Y but otherwise fine"),
      (51L, "perfectly clean training document with plenty of original words"),
      (52L, s"collider carrier $s2 more text")).toDF("doc_id", "text")
    val r = Dedup.decontaminateStrip(d, col("doc_id") < 20L, 40).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r.keySet == Set(50L, 51L, 52L), "benchmark docs are not emitted")
    assert(!r(50L).contains("benchmark passage") &&
      r(50L).startsWith("training doc contaminated X") &&
      r(50L).endsWith("Y but otherwise fine"), s"surgery wrong: '${r(50L)}'")
    assert(r(51L) == "perfectly clean training document with plenty of original words")
    assert(r(52L) == s"collider carrier $s2 more text",
      "hash collision with a benchmark window must not cut")
  }

  test("anchorMod keeps content-aligned windows: a long shared span is still flagged in both docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    // a 400-char shared span: ~361 windows, ~90 expected anchors at s=4
    val span = (1 to 80).map(_ => ('a' + rnd.nextInt(26)).toChar.toString * 4).mkString(" ").take(400)
    val d = Seq(
      (1L, s"prefixQ${span}Wsuffix"),
      (2L, s"otherZ${span}Ktail"),
      (3L, "entirely unrelated content with no duplication anywhere at all"))
      .toDF("doc_id", "text")
    val r = Dedup.dupSubstringStats(d, 40, anchorMod = 4).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r(1L) > 0 && r(2L) > 0, s"anchored signal missed the shared span: $r")
    assert(r(1L) == r(2L), "the two copies must anchor the same windows")
    assert(r(3L) == 0)
  }

  test("RemoveSpans clips out-of-range long positions instead of wrapping through toInt") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = UTF8String.fromString("hello world")
    // 2^32 wraps to 0 via toInt: an unclipped narrow would delete everything
    val out = graft.plans.RemoveSpans.compute(s, Array(4294967296L), 5)
    assert(out.toString == "hello world", s"wrapped position mutated text: '$out'")
    assert(graft.plans.RemoveSpans.compute(s, Array(-3L), 5).toString == "llo world")
  }

  test("dupSubstringStats: planted cross-doc span found, unique docs read zero") {
    import spark.implicits._
    // 60-char span; the docs' boundary characters around it differ
    // (Q/W vs Z/K) so the SHARED substring is exactly the span
    val span = "the quick brown fox jumps over the lazy dog again and again!"
    val d = Seq(
      (1L, s"alphaQ${span}Womega"),
      (2L, s"totally different prefixZ${span}Ksuffix"),
      (3L, "no shared spans in this one at all just unique words qqq"),
      (4L, "xy")) // shorter than L: zero windows
      .toDF("doc_id", "text")
    val r = Dedup.dupSubstringStats(d, 40).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // 60-char shared span yields 60-40+1 = 21 shared windows in each
    assert(r(1L)._2 == 21 && r(2L)._2 == 21,
      s"expected 21 shared windows, got ${r(1L)} / ${r(2L)}")
    assert(r(3L)._2 == 0)
    assert(r(4L) == (0L, 0L))
    // windows counted per doc: chars - L + 1
    assert(r(1L)._1 == s"alphaQ${span}Womega".length - 39)
  }

  test("dupSubstringStats: planted HOT window (10^4 occurrences of one h) stays linear and exact") {
    import spark.implicits._
    // Skew plant (round 19, VERDICT #8): one 40-char span S replicated
    // 2500x inside one document plus shared across two small docs puts
    // ~10^4 h-rows of ONE key on a single post-exchange task. The
    // single-h-keyed shape's per-task work is LINEAR in that key's
    // occurrence count (one hash-agg probe + one window row per
    // occurrence — never pairwise), so the plant must complete fast
    // and EXACTLY: in S^2500 only the 40-aligned windows equal S
    // (rotations r != 0 occur only inside the hot doc itself, so their
    // nd = 1 and they are not dups); doc 1/2 share exactly the S
    // window with the hot doc. The production dial for keys hot enough
    // to straggle a task (10^8+, boilerplate at corpus scale) is
    // anchorMod > 1 — content-defined sampling, documented on the
    // operator — which this test's exactness pins must survive
    // unchanged at the default anchorMod = 1.
    val span = "0123456789abcdefghijklmnopqrstuvwxyzABCD" // exactly 40 chars
    assert(span.length == 40)
    val hot = span * 2500 // 100k chars, hot h occurs 2500x in ONE doc
    val d = Seq(
      (1L, s"Q${span}W"), // S once, distinct neighbors
      (2L, s"Z${span}K"),
      (3L, hot),
      (4L, "entirely unique text with no forty char repeats anywhere here"))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val r = Dedup.dupSubstringStats(d, 40).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    val sec = (System.nanoTime() - t0) / 1e9
    assert(r(1L)._2 == 1 && r(2L)._2 == 1, s"${r(1L)} / ${r(2L)}")
    // hot doc: exactly the 2500 S-aligned windows are cross-doc dups
    assert(r(3L) == (100000L - 39L, 2500L), s"${r(3L)}")
    assert(r(4L)._2 == 0)
    // linearity guard, generous: a pairwise blow-up on 2500 co-keyed
    // rows would be ~6M window comparisons on one task and minutes of
    // wall; linear completes in seconds even on a contended host
    assert(sec < 120.0, f"hot-key plant took $sec%.1f s — not linear?")
  }

  test("cdcChunkStats: planted HOT chunk (shared passage replicated 10^3x) completes and counts exactly") {
    import spark.implicits._
    // CDC analog of the hot-window plant: a shared word passage chunks
    // identically wherever it appears (content-defined boundaries), so
    // a passage replicated 1000x in one doc + once in two others puts
    // every occurrence of its chunk hashes on single tasks. Exactness
    // at the hot key is the guard against any future shape change
    // silently double-counting under skew.
    val passage = (1 to 64).map(i => s"w$i").mkString(" ")
    val hot = Seq.fill(1000)(passage).mkString(" ")
    val d = Seq(
      (1L, passage),
      (2L, passage),
      (3L, hot),
      (4L, (1 to 64).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Dedup.cdcChunkStats(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // docs 1/2 are identical: every chunk is a cross-doc dup
    assert(r(1L)._1 == r(1L)._2 && r(1L)._2 > 0, s"${r(1L)}")
    assert(r(1L) == r(2L))
    // the hot doc's interior repeats chunk the same as the passage's
    // own chunking wherever boundaries realign; at minimum every
    // occurrence of the passage's INTERIOR chunks (those fully inside
    // one repetition) is a cross-doc dup, so dup_chunks must be large
    // and can never exceed n_chunks
    assert(r(3L)._2 > 0 && r(3L)._2 <= r(3L)._1, s"${r(3L)}")
    assert(r(4L)._2 == 0)
  }

  test("size-adaptive exchange shapes agree: combine-first == one-exchange for window and CDC stats") {
    import spark.implicits._
    // Round 19 (the q77 cold-protocol settle): the exchange shape now
    // derives from input size — one h-keyed exchange of the raw stream
    // below combineMinBytes, map-side-combined (h, doc) aggregation +
    // re-key at scale. The two shapes must be ROW-IDENTICAL on any
    // corpus; this pins it on data exercising every case (cross-doc
    // dup, within-doc hot repetition, unique doc, sub-L doc).
    val span = "0123456789abcdefghijklmnopqrstuvwxyzABCD"
    val passage = (1 to 64).map(i => s"p$i").mkString(" ")
    val d = Seq(
      (1L, s"Q${span}W$passage"),
      (2L, s"Z${span}K"),
      (3L, span * 50 + " " + passage),
      (4L, "unique text with no forty char repeats at all here"),
      (5L, "xy"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(rows(Dedup.dupSubstringStats(d, 40, combineFirst = Some(true))) ==
      rows(Dedup.dupSubstringStats(d, 40, combineFirst = Some(false))))
    assert(rows(Dedup.cdcChunkStats(d, combineFirst = Some(true))) ==
      rows(Dedup.cdcChunkStats(d, combineFirst = Some(false))))
  }
}
