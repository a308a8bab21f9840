package graft

import org.apache.spark.sql.functions._

import graft.operators.UnigramLm

/** Unigram-LM trainer/encoder semantics beyond the q105 oracle: the
  * hand-computable EM round (the Kudo 2018 toy shape), distributed ==
  * local forward-backward, deterministic fixed-point E-tables, train
  * convergence/determinism, and Viterbi encode == the local DP. */
class UnigramLmSpec extends SparkTestBase {

  import UnigramLm.Scale

  private def vocabDf(words: (String, Long)*) = {
    import spark.implicits._
    words.toSeq.toDF("w", "cnt")
  }

  test("EM expected counts match the hand-computed lattice: 'ab'") {
    // model {a:1/4, b:1/4, ab:1/2} on the single word "ab":
    //   α = [1, 1/4, 9/16]; Z = 9/16
    //   E[ab] = (1/2)/Z = 8/9;  E[a] = E[b] = (1/16)/Z = 1/9
    val model = Map("a" -> 0.25, "b" -> 0.25, "ab" -> 0.5)
    val e = UnigramLm.expectedCounts(vocabDf("ab" -> 1L), model, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def approx(p: String, want: Double): Unit =
      assert(math.abs(e(p).toDouble / Scale - want) < 1e-5,
        s"E[$p] = ${e(p).toDouble / Scale}, want $want")
    approx("ab", 8.0 / 9.0)
    approx("a", 1.0 / 9.0)
    approx("b", 1.0 / 9.0)
  }

  test("EM expected counts: three-segmentation 'abc' lattice, weighted by count") {
    // pieces {a,b,c,ab,bc}, all prob 0.2; word "abc" with count 5.
    // Segmentations: [a,b,c] p=0.008, [ab,c] p=0.04, [a,bc] p=0.04 →
    // Z=0.088; E[ab]=E[bc]=0.04/0.088; E[c]=(0.008+0.04)/0.088;
    // E[a]=(0.008+0.04)/0.088; E[b]=0.008/0.088 — each × count 5.
    val model = Map("a" -> 0.2, "b" -> 0.2, "c" -> 0.2, "ab" -> 0.2, "bc" -> 0.2)
    val e = UnigramLm.expectedCounts(vocabDf("abc" -> 5L), model, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val z = 0.088
    val want = Map(
      "ab" -> 0.04 / z * 5, "bc" -> 0.04 / z * 5, "b" -> 0.008 / z * 5,
      "a" -> (0.008 + 0.04) / z * 5, "c" -> (0.008 + 0.04) / z * 5)
    for ((p, v) <- want)
      assert(math.abs(e(p).toDouble / Scale - v) < 1e-5,
        s"E[$p] = ${e(p).toDouble / Scale}, want $v")
    // local reference agrees too
    val local = UnigramLm.expectedLocal("abc", 5L, model, 4)
    for ((p, v) <- local)
      assert(math.abs(e(p).toDouble / Scale - v) < 1e-5, s"local mismatch on $p")
  }

  test("distributed E-step == the local reference on a random vocab, any partitioning") {
    val rnd = new scala.util.Random(3)
    val alphabet = "abcd"
    val words = (1 to 60).map { i =>
      val w = (1 to (rnd.nextInt(8) + 1)).map(_ => alphabet(rnd.nextInt(4))).mkString
      w -> (rnd.nextInt(9) + 1).toLong
    }
    // model: all chars + a few bigrams, unnormalized-ish probs
    val model = Map("a" -> 0.15, "b" -> 0.15, "c" -> 0.15, "d" -> 0.15,
      "ab" -> 0.1, "cd" -> 0.1, "abc" -> 0.1, "dd" -> 0.1)
    val dist = UnigramLm.expectedCounts(
      vocabDf(words: _*).repartition(7), model, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val local = words.foldLeft(Map.empty[String, Double]) { case (acc, (w, c)) =>
      UnigramLm.expectedLocal(w, c, model, 4).foldLeft(acc) {
        case (a, (p, v)) => a.updated(p, a.getOrElse(p, 0.0) + v)
      }
    }
    assert(dist.keySet == local.keySet.filter(local(_) > 0))
    // per-word fixed-point rounding: tolerance = #words / Scale
    for ((p, v) <- local if v > 0)
      assert(math.abs(dist(p).toDouble / Scale - v) < words.size.toDouble / Scale + 1e-9,
        s"E[$p]: dist ${dist(p).toDouble / Scale} vs local $v")
    // integer E-table ⇒ bit-identical across partitionings
    val dist2 = UnigramLm.expectedCounts(
      vocabDf(words: _*).repartition(2), model, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist == dist2, "fixed-point E-table must not depend on partitioning")
  }

  test("train: deterministic, vocab-bounded, and learns the planted piece") {
    import spark.implicits._
    // "zq" appears in every word; a unigram model with a tight budget
    // must keep it as a piece with high probability
    val docs = (1 to 40).map(i => s"zqx${i % 3} yzqw zq${i % 5}zq").toDF("text")
    val m1 = UnigramLm.train(docs, targetVocab = 12, seedSize = 64,
      maxPieceLen = 4, emPerRound = 2)
    val m2 = UnigramLm.train(docs, targetVocab = 12, seedSize = 64,
      maxPieceLen = 4, emPerRound = 2)
    assert(m1 == m2, "train must be run-to-run deterministic")
    assert(m1.size <= 12 + 10, s"vocab should shrink toward target, got ${m1.size}")
    val probs = m1.toMap
    assert(probs.contains("zq"), s"planted piece 'zq' missing from ${m1.map(_._1)}")
    // it outweighs every single char it is built from
    assert(probs("zq") > probs.getOrElse("q", 0.0))
    val tot = m1.map(_._2).sum
    assert(math.abs(tot - 1.0) < 1e-9, s"probs must normalize, got $tot")
  }

  test("Viterbi encode: hand cases and == the local DP, incl. unknown chars") {
    import spark.implicits._
    // prefer the single piece when its log-prob beats the sum
    val m1 = Seq("ab" -> 0.8, "a" -> 0.1, "b" -> 0.1)
    val r1 = UnigramLm.encodeViterbi(Seq("ab").toDF("text"), "text", m1, 4)
      .select("tokens").as[Seq[String]].head()
    assert(r1 == Seq("ab"))
    // prefer the char split when it wins on probability
    val m2 = Seq("a" -> 0.45, "b" -> 0.45, "ab" -> 0.1)
    val r2 = UnigramLm.encodeViterbi(Seq("ab").toDF("text"), "text", m2, 4)
      .select("tokens").as[Seq[String]].head()
    assert(r2 == Seq("a", "b"))
    // equal scores tie-break to the LONGER piece: p(ab) = p(a)·p(b)
    val m3 = Seq("a" -> 0.2, "b" -> 0.2, "ab" -> 0.04)
    val r3 = UnigramLm.encodeViterbi(Seq("ab").toDF("text"), "text", m3, 4)
      .select("tokens").as[Seq[String]].head()
    assert(r3 == Seq("ab"))
    // random corpus vs the local DP, with out-of-model chars ('!')
    val rnd = new scala.util.Random(17)
    val model = Seq("a" -> 0.3, "b" -> 0.2, "c" -> 0.1, "ab" -> 0.15,
      "bc" -> 0.15, "abc" -> 0.1)
    val logp = model.map { case (p, pr) => p -> math.log(pr) }.toMap
    val texts = (1 to 40).map { _ =>
      (1 to (rnd.nextInt(3) + 1)).map { _ =>
        (1 to (rnd.nextInt(9) + 1)).map(_ => "abc!"(rnd.nextInt(4))).mkString
      }.mkString(" ")
    }
    val got = UnigramLm.encodeViterbi(texts.toDF("text"), "text", model, 4)
      .select("text", "tokens").as[(String, Seq[String])].collect().toMap
    for (t <- texts) {
      val want = t.split(" ").filter(_.nonEmpty)
        .flatMap(w => UnigramLm.viterbiLocal(w, logp, 4)).toSeq
      assert(got(t) == want, s"Viterbi diverged on '$t': ${got(t)} vs $want")
    }
    // tokens concatenate back to the words — nothing lost or split
    for (t <- texts)
      assert(got(t).mkString == t.split(" ").filter(_.nonEmpty).mkString)
  }

  test("encodeViterbi plans as a pure projection: no shuffle, no join") {
    import spark.implicits._
    val model = Seq("a" -> 0.5, "b" -> 0.3, "ab" -> 0.2)
    val out = UnigramLm.encodeViterbi(
      (1 to 10).map(i => s"ab ba").toDF("text"), "text", model, 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encoder must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"encoder must not join:\n$plan")
  }
}
