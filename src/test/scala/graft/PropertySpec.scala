package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextFunctions
import graft.plans.QuantizedDotProduct

/** Property-based checks (raw scalacheck generators driven from
  * deterministic seeds — the scalatest/scalacheck bridge artifact is
  * not on the offline classpath): the native expression against a
  * plain-Scala model, and the split bucketing's range/determinism.
  */
class PropertySpec extends SparkTestBase {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val vecGen: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](8, Gen.chooseNum(-1.0f, 1.0f))

  private def model(a: Array[Float], b: Array[Float]): Long =
    a.zip(b).map { case (x, y) =>
      math.floor(x.toDouble * 1e7).toLong * math.floor(y.toDouble * 1e7).toLong
    }.sum

  test("QuantizedDotProduct matches the scalar model on random vectors") {
    import spark.implicits._
    val pairs = (1 to 200).map(i =>
      (sample(vecGen, i * 2L), sample(vecGen, i * 2L + 1)))
    val df = pairs.toDF("x", "y")
    val got = df.select(QuantizedDotProduct(col("x"), col("y")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == pairs.map { case (a, b) => model(a, b) })
  }

  test("AsOfJoin matches a scalar model on random key/time data (incl. ties)") {
    import spark.implicits._
    import graft.operators.AsOfJoin
    // small domains force key collisions and timestamp TIES, the
    // interesting cases for the at-or-before + max-tie semantics
    val rowGen = for {
      k <- Gen.chooseNum(1L, 4L)
      ts <- Gen.chooseNum(0L, 20L)
    } yield (k, ts)
    val leftRows = (1 to 120).map(i => sample(rowGen, 1000L + i))
      .zipWithIndex.map { case ((k, ts), i) => (k, ts, 10000L + i) }
    val rightRows = (1 to 80).map(i => sample(rowGen, 9000L + i))
      .zipWithIndex.map { case ((k, ts), i) => (k, ts, 20000L + i) }

    val got = AsOfJoin.lastAtOrBefore(
        leftRows.toDF("k", "ts", "id"), rightRows.toDF("k", "ts", "id"),
        "k", "ts", "id", Seq("id"))
      .select(col("id"), col("asof_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap

    // scalar model: latest right at-or-before; ties -> greatest id
    val byKey = rightRows.groupBy(_._1)
    for ((k, lts, lid) <- leftRows) {
      val expect = byKey.getOrElse(k, Nil)
        .filter(_._2 <= lts)
        .sortBy(r => (r._2, r._3))
        .lastOption.map(_._3)
      assert(got(lid) == expect, s"left row ($k,$lts,$lid): got ${got(lid)}, want $expect")
    }
  }

  test("FirstCleanPair matches the combo-enumeration model on random hash pairs") {
    import spark.implicits._
    import graft.operators.Dedup
    // mix of near pairs (few planted bit flips — the operator's real
    // input) and unrelated hashes (mostly no clean pair -> -1)
    val hashGen = Gen.chooseNum(0L, (1L << 60) - 1)
    val flipsGen = Gen.containerOfN[Seq, Int](6, Gen.chooseNum(0, 59))
    val pairs = (1 to 300).map { i =>
      val h = sample(hashGen, i * 31L)
      if (i % 2 == 0) (h, sample(hashGen, i * 31L + 7))
      else (h, sample(flipsGen, i * 31L + 7).foldLeft(h)((x, b) => x ^ (1L << b)))
    }
    def model(ha: Long, hb: Long): Int =
      Dedup.SimPairCombos.zipWithIndex.collectFirst { case ((i, j), c)
        if Seq(i, j).forall { k =>
          ((ha ^ hb) >>> Dedup.SimBlockShifts(k)) % (1L << Dedup.SimBlockWidths(k)) == 0L
        } => c }.getOrElse(-1)
    val got = pairs.toDF("ha", "hb")
      .select(graft.plans.FirstCleanPair(col("ha"), col("hb"),
        Dedup.SimBlockShifts, Dedup.SimBlockWidths).as("c"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == pairs.map { case (a, b) => model(a, b) })
  }

  test("FirstInt equals the regex+cast chain on adversarial strings") {
    import spark.implicits._
    // digit runs in unicode soup, leading zeros, runs at string
    // boundaries, multiple runs (first wins), and int-overflow runs
    // (where the native form returns NULL instead of the ANSI fault —
    // excluded from the equality domain, asserted separately in
    // FirstIntSpec)
    val ch = Gen.frequency(4 -> Gen.alphaNumChar, 2 -> Gen.numChar,
      1 -> Gen.oneOf('é', '中', ' ', '{', '"', ':', '-'))
    val strGen = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.containerOfN[Seq, Char](n, ch).map(_.mkString))
    val all = (1 to 200).map(i => sample(strGen, 900L + i)) ++
      Seq("", "007", "abc", "12abc34", "中9中", "{\"k\": 42}")
    // The regex+ANSI-cast chain's total domain is strings whose first
    // digit run exists and fits INT: regexp_extract yields '' on no
    // match and ANSI CAST('' AS INT) FAULTS (as does an overflowing
    // run). FirstInt returns NULL on both instead — strictly more
    // robust; the equality property holds on the chain's domain.
    val strs = all.filter(s =>
      "\\d+".r.findFirstIn(s).exists(r => BigInt(r) <= Int.MaxValue))
    val df = strs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "s")
    val got = df.select(col("id"),
        graft.plans.FirstInt(col("s")).as("n"),
        regexp_extract(col("s"), "(\\d+)", 1).cast("int").as("r"))
      .collect()
    val bad = got.filter(r => r.isNullAt(1) != r.isNullAt(2) ||
      (!r.isNullAt(1) && r.getInt(1) != r.getInt(2)))
    assert(bad.isEmpty, s"FirstInt != regex on: ${bad.take(5).mkString(", ")}")
    // outside that domain the native form is total: NULL, no fault
    val digitless = all.filter(s => "\\d".r.findFirstIn(s).isEmpty)
    assert(digitless.nonEmpty)
    val nulls = digitless.toDF("s")
      .select(graft.plans.FirstInt(col("s")).as("n")).collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("SimHash60 equals the explode + 60-vote SQL pipeline on adversarial texts") {
    import spark.implicits._
    // word-char soup with spaces forced in: double spaces produce
    // EMPTY segments (which the split pipeline hashes too), plus
    // unicode, and the degenerate all-space / empty cases
    val wordChar = Gen.frequency(6 -> Gen.alphaNumChar, 1 -> Gen.const(' '),
      1 -> Gen.oneOf('é', 'ß', '中', '!', '('))
    val textGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.containerOfN[Seq, Char](n, wordChar).map(_.mkString))
    val texts = (1 to 150).map(i => sample(textGen, 500L + i)) ++
      Seq("", " ", "  ", "a  b", " leading", "trailing ", "één 中文 mixé")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = df
      .select(col("doc_id"), graft.plans.SimHash60(trim(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bitSums = (0 until 60).map(b =>
      sum(when(expr(s"(shiftright(h, $b) % 2) = 1"), 1L).otherwise(-1L)).as(s"bit$b"))
    val fold = (0 until 60)
      .map(b => when(col(s"bit$b") > 0, lit(1L << b)).otherwise(0L))
      .reduceLeft(_ + _)
    val sql = df
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("w"))
      .withColumn("h", expr("CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT)"))
      .groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .withColumn("sh", fold)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("sh")).toMap
    assert(native == sql)
  }

  test("ShingleHashes equals the split+md5 model on adversarial texts") {
    import spark.implicits._
    import graft.operators.Dedup.P
    def model(s: String, n: Int): Seq[Long] = {
      val ws = s.split(" ", -1) // keeps empty segments, like the expression
      (0 to ws.length - n).map { i =>
        val g = ws.slice(i, i + n).mkString(" ")
        val md = java.security.MessageDigest.getInstance("MD5")
        val d = md.digest(g.getBytes("UTF-8"))
        val h = (0 until 6).foldLeft(0L)((a, k) => (a << 8) | (d(k) & 0xffL))
        h % P
      }
    }
    val wordGen = Gen.oneOf(Gen.identifier.map(_.take(6)), Gen.const(""), Gen.const("héllo"))
    val textGen = Gen.listOf(wordGen).map(_.take(12).mkString(" "))
    val texts = "" +: "a" +: "a b" +: "a  b   c" +: " lead trail " +:
      (1 to 120).map(i => sample(textGen, i.toLong))
    val df = texts.toDF("text")
    val got = df.select(graft.plans.ShingleHashes(col("text"), 3, P).as("v"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    assert(got == texts.map(model(_, 3)))
    // and the hash-rows operator matches the string-shingle operator's
    // hash multiset per doc (same stream the MIN aggregates consume)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val viaStrings = graft.operators.Dedup
      .shingleRows(docs, dedup = false)
      .withColumn("h", expr(s"CAST(conv(substr(md5(g), 1, 12), 16, 10) AS BIGINT) % $P"))
      .groupBy(col("doc_id")).agg(sort_array(collect_list(col("h"))).as("hs"))
    val viaNative = graft.operators.Dedup
      .shingleHashRows(docs)
      .groupBy(col("doc_id")).agg(sort_array(collect_list(col("h"))).as("hs"))
    val a = viaStrings.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = viaNative.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
  }

  test("SpaceWords equals the split(trim)+explode+nonempty-filter composition") {
    import spark.implicits._
    val wordGen = Gen.oneOf(Gen.identifier.map(_.take(6)), Gen.const(""),
      Gen.const("héllo"), Gen.const("日本語"), Gen.const("a\tb"))
    val textGen = Gen.listOf(wordGen).map(_.take(12).mkString(" "))
    val texts = "" +: "a" +: "a b" +: "a  b   c" +: " lead trail " +: "  " +:
      "\ttab\t" +: (1 to 120).map(i => sample(textGen, 4000L + i))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def wordsOf(c: org.apache.spark.sql.DataFrame) = c.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val composed = wordsOf(df
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0))
    val native = wordsOf(df.select(col("doc_id"),
      explode(graft.plans.SpaceWords(col("text"))).as("w")))
    assert(native == composed)
    val nulls = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
    assert(nulls.select(explode(graft.plans.SpaceWords(col("text")))).count() == 0)
  }

  test("SubstrPieces equals the nested-transform substr composition") {
    import spark.implicits._
    val wordGen = Gen.oneOf(Gen.identifier.map(_.take(9)), Gen.const("a"),
      Gen.const("héllo"), Gen.const("日本語のテキスト"), Gen.const("naïve🙂x"))
    // NON-EMPTY words only: substrPieces' contract excludes "" (Spark's
    // sequence(1, 0) DESCENDS, so the composed form emits garbage ""
    // pieces there; every caller feeds len>0 vocab words). The native
    // form's empty-input behavior is asserted separately below.
    val words = "a" +: "ab" +: "日本語" +: "🙂🙂🙂🙂" +:
      (1 to 150).map(i => sample(wordGen, 3000L + i)).filter(_.nonEmpty)
    val df = words.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "w")
    for (maxLen <- Seq(1, 3, 6)) {
      val composed = df.select(col("doc_id"),
          graft.operators.UnigramLm.substrPieces(col("w"), maxLen).as("ps"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val native = df.select(col("doc_id"),
          graft.plans.SubstrPieces(col("w"), maxLen).as("ps"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(native == composed, s"maxLen=$maxLen diverged")
    }
    // NULL word: NULL through the expression, no rows through explode;
    // empty word: empty array (the native form is total where the
    // composed reference was contractually partial)
    val edge = Seq((1L, Option.empty[String]), (2L, Some(""))).toDF("doc_id", "w")
    assert(edge.select(explode(
      graft.plans.SubstrPieces(col("w"), 6))).count() == 0)
  }

  test("WordHashPairs equals the zip_with(split, ShingleHashes)+filter composition") {
    import spark.implicits._
    import graft.operators.Keywords.HashP
    val wordGen = Gen.oneOf(Gen.identifier.map(_.take(6)), Gen.const(""),
      Gen.const("héllo"), Gen.const("日本語"))
    val textGen = Gen.listOf(wordGen).map(_.take(12).mkString(" "))
    val texts = "" +: "a" +: "a b" +: "a  b   c" +: " lead trail " +: "  " +:
      (1 to 120).map(i => sample(textGen, 1000L + i))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def pairsOf(c: org.apache.spark.sql.DataFrame) = c.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val composed = pairsOf(df.select(col("doc_id"),
        explode(zip_with(split(col("text"), " "),
          graft.plans.ShingleHashes(col("text"), 1, HashP),
          (w, h) => struct(w.as("term"), h.as("h")))).as("t"))
      .filter(length(col("t.term")) > 0)
      .select(col("doc_id"), col("t.term"), col("t.h")))
    val native = pairsOf(df.select(col("doc_id"),
        explode(graft.plans.WordHashPairs(col("text"), HashP)).as("t"))
      .select(col("doc_id"), col("t.term"), col("t.h")))
    assert(native == composed)
    // NULL text: both produce no rows through explode
    val nulls = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
    assert(nulls.select(explode(
      graft.plans.WordHashPairs(col("text"), HashP))).count() == 0)
  }

  test("ContextPairHashes equals the two-ShingleHashes zip composition") {
    import spark.implicits._
    import graft.operators.LangModel.NumBuckets
    val wordGen = Gen.oneOf(Gen.identifier.map(_.take(6)), Gen.const(""),
      Gen.const("héllo"), Gen.const("日本語"))
    val textGen = Gen.listOf(wordGen).map(_.take(12).mkString(" "))
    val texts = "" +: "a" +: "a b" +: "a  b   c" +: " lead trail " +: "a " +:
      " " +: (1 to 120).map(i => sample(textGen, 2000L + i))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def pairsOf(c: org.apache.spark.sql.Column) = df
      .select(col("doc_id"), c.as("p")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getLong(1))))
      .toMap
    val u1 = graft.plans.ShingleHashes(col("text"), 1, NumBuckets)
    val b2 = graft.plans.ShingleHashes(col("text"), 2, NumBuckets)
    val composed = pairsOf(zip_with(
      slice(u1, lit(1), greatest(size(u1) - 1, lit(0))), b2,
      (a, b) => struct(a.as("b1"), b.as("b2"))))
    val native = pairsOf(graft.plans.ContextPairHashes(col("text"), NumBuckets))
    assert(native == composed)
  }

  test("BandKeys equals the transform+array_join+md5 composition on random signatures") {
    import spark.implicits._
    import graft.operators.Dedup.{Bands, RowsPerBand, NumHashes, P}
    val sigGen = Gen.containerOfN[Seq, Long](NumHashes, Gen.chooseNum(0L, P - 1))
    val sigs = (1 to 150).map(i => sample(sigGen, 3000L + i)) :+
      Seq.fill(NumHashes)(0L) :+ (0L until NumHashes.toLong)
    val df = sigs.toDF("sg")
    val composed = df.select(transform(sequence(lit(0), lit(Bands - 1)),
        b => md5(array_join(
          transform(slice(col("sg"), b * RowsPerBand + 1, lit(RowsPerBand)),
            v => v.cast("string")), ","))).as("k"))
      .collect().map(_.getSeq[String](0)).toSeq
    val native = df.select(
        graft.plans.BandKeys(col("sg"), Bands, RowsPerBand).as("k"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(native == composed)
  }

  test("SigMatches equals the zip_with+filter+size composition on random signatures") {
    import spark.implicits._
    import graft.operators.Dedup.{NumHashes, P}
    val sigGen = Gen.containerOfN[Seq, Long](NumHashes, Gen.chooseNum(0L, 7L))
    val pairs = (1 to 150).map(i =>
      (sample(sigGen, 4000L + i), sample(sigGen, 5000L + i))) :+
      ((0L until NumHashes.toLong).toSeq, (0L until NumHashes.toLong).toSeq)
    val df = pairs.toDF("sa", "sb")
    val composed = df.select(
        size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y), v => v))
          .cast("long").as("c"))
      .collect().map(_.getLong(0)).toSeq
    val native = df.select(graft.plans.SigMatches(col("sa"), col("sb")).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(native == composed)
  }

  test("UniBiBuckets equals the concat-of-two-ShingleHashes composition") {
    import spark.implicits._
    import graft.operators.Dsir.NumBuckets
    val wordGen = Gen.oneOf(Gen.identifier.map(_.take(6)), Gen.const(""),
      Gen.const("héllo"), Gen.const("日本語"))
    val textGen = Gen.listOf(wordGen).map(_.take(12).mkString(" "))
    val texts = "" +: "a" +: "a b" +: "a  b   c" +: " lead trail " +: "a " +:
      " " +: (1 to 120).map(i => sample(textGen, 6000L + i))
    val df = texts.toDF("text")
    val composed = df.select(concat(
        graft.plans.ShingleHashes(col("text"), 1, NumBuckets),
        graft.plans.ShingleHashes(col("text"), 2, NumBuckets)).as("v"))
      .collect().map(_.getSeq[Long](0)).toSeq
    val native = df.select(
        graft.plans.UniBiBuckets(col("text"), NumBuckets).as("v"))
      .collect().map(_.getSeq[Long](0)).toSeq
    assert(native == composed)
  }

  test("BucketCounts equals the explode+groupBy histogram") {
    import spark.implicits._
    val arrGen = Gen.listOf(Gen.chooseNum(0L, 30L)).map(_.take(40))
    val arrays = Seq.empty[Long] +: Seq(7L) +: Seq(3L, 3L, 3L) +:
      (1 to 100).map(i => sample(arrGen, 9000L + i).toSeq)
    val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "arr")
    val composed = df
      .select(col("id"), explode(col("arr")).as("bucket"))
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("n_occ"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val native = df
      .select(col("id"),
        explode(graft.plans.BucketCounts(col("arr"))).as("bc"))
      .select(col("id"), col("bc.bucket"), col("bc.n_occ"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native == composed)
    // in-row order contract: buckets strictly ascending per row
    val asc = df.select(graft.plans.BucketCounts(col("arr")).as("bcs"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(0)))
    assert(asc.forall(s => s.zip(s.drop(1)).forall { case (a, b) => a < b }))
  }

  test("minhashPairsOwned equals the slim join+distinct+join-back pipeline on random corpora") {
    import spark.implicits._
    import graft.operators.Dedup
    // near-dup-rich corpus: a few base texts, each perturbed a little,
    // so band collisions and MULTI-band matches (the ownership dedup's
    // whole point) actually occur
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val baseGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))
    val texts = (1 to 8).flatMap { b =>
      val base = sample(baseGen, 77L + b)
      val ws = base.split(" ")
      (0 to 5).map { v =>
        if (v == 0) base
        else ws.updated(sample(Gen.chooseNum(0, ws.length - 1), b * 100L + v),
          "w" + v).mkString(" ")
      }
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sig = Dedup.withSignature(Dedup.shingleRows(docs, dedup = false))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val owned = canon(Dedup.minhashPairsOwned(sig))
    // the reference pipeline shape the ownership variant replaced
    val buckets = Dedup.lshBuckets(sig).select(col("doc_id"), col("b"), col("bkey"))
    val slim = canon(buckets.select(col("doc_id").as("a"), col("b"), col("bkey"))
      .join(buckets.select(col("doc_id").as("b_id"), col("b"), col("bkey")), Seq("b", "bkey"))
      .filter(col("a") < col("b_id"))
      .select(col("a"), col("b_id")).distinct()
      .join(sig.select(col("doc_id").as("a"), col("sg").as("sa")), Seq("a"))
      .join(sig.select(col("doc_id").as("b_id"), col("sg").as("sb")), Seq("b_id"))
      .withColumn("sim_est", Dedup.signatureSimilarity(col("sa"), col("sb")))
      .filter(col("sim_est") >= 0.5)
      .select(col("a"), col("b_id").as("b"), col("sim_est")))
    assert(owned.nonEmpty, "degenerate corpus: no near-dup pairs generated")
    assert(owned == slim)
  }

  test("uttCmdPrompt matches a plain-Scala prompts.py:55-98 model on random block combinations") {
    import spark.implicits._
    import graft.functions.{PromptFunctions => P}
    val lineGen = Gen.nonEmptyListOf(Gen.identifier.map(_.take(8))).map(_.take(4).mkString(" "))
    val caseGen = for {
      actors <- Gen.listOf(lineGen).map(_.take(3))
      current <- Gen.option(lineGen)
      rpLines <- Gen.nonEmptyListOf(lineGen).map(_.take(3))
    } yield (actors, current, rpLines.mkString("\n"))

    val cases = (1 to 150).map(i => sample(caseGen, i.toLong))
    def model(actors: Seq[String], current: Option[String], rp: String): String = {
      val parts = Seq.newBuilder[String]
      if (actors.nonEmpty)
        parts += "Actors:\n" + actors.map("- " + _).mkString("\n")
      parts += "Current:\n" + current.getOrElse("None")
      parts += rp
      parts.result().mkString("\n\n") + "\n<|asep|>\n"
    }

    val df = cases.toDF("actors", "current", "rp")
    val got = df.select(P.uttCmdPrompt(
      P.actorsBlock(col("actors")), col("current"), col("rp")).as("v"))
      .collect().map(_.getString(0)).toSeq
    val want = cases.map { case (a, c, r) => model(a, c, r) }
    assert(got == want)
    // structural invariant the reference guarantees
    assert(got.forall(_.endsWith("\n<|asep|>\n")))
  }

  test("hashBucket is always in range and stable across evaluations") {
    import spark.implicits._
    val ids = (1 to 500).map(i =>
      sample(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue), i.toLong))
    val df = ids.toDF("id")
    val b1 = df.select(TextFunctions.hashBucket(col("id"), "split", 10).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b1.forall(b => b >= 0 && b < 10))
    val b2 = df.select(TextFunctions.hashBucket(col("id"), "split", 10).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b1 == b2)
    // buckets are reasonably spread (not all in one bucket)
    assert(b1.distinct.size == 10)
  }
}
