package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality
import graft.queries.CleanOps

class CleanOpsSpec extends SparkTestBase {

  private def q(name: String) =
    CleanOps.all.find(_.name == name).get.run(spark, sfDir)

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("lm ppl: hand-computed nll, planted preference, strata") {
    import graft.operators.LangModel
    // target slice = docs 0 and 1; each is "the cat": model = one
    // context bucket ("the") with c1 = 2, one bigram bucket
    // ("the cat") with c2 = 2
    val d = docsOf(
      0L -> "the cat",
      1L -> "the cat",
      2L -> "the cat",     // in-model: nll = -ln((2+1)/(2+1024))
      3L -> "dog kennel",  // out-of-model: unseen buckets w.h.p.
      4L -> "solo")        // one word: no bigram, unscorable
    val pred = col("doc_id") < 2
    val r = LangModel.nll(d, pred).collect()
      .map(x => x.getLong(0) -> (x.getLong(1),
        if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toMap
    val expected = -math.log(3.0 / 1026.0)
    assert(math.abs(r(2L)._2.get - expected) < 1e-12,
      s"in-model nll ${r(2L)}")
    // unseen bigram scores ln(1/(c1+k)) <= ln(1/k) — strictly worse
    // than the planted in-model doc (unless its buckets md5-collide
    // into the model's, which the fixed hash makes deterministic:
    // this assertion doubles as the no-collision witness)
    assert(r(3L)._2.get > r(2L)._2.get, s"planted preference: $r")
    assert(r(4L) == ((0L, None)), s"unscorable doc: ${r(4L)}")
    // strata: lo between the two scores, hi above both -> head/middle;
    // the unscorable doc lands in the tail
    val lab = LangModel.headMiddleTail(
      LangModel.nll(d, pred), lo = expected + 0.1, hi = 100.0)
      .collect().map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(lab(2L) == "head" && lab(3L) == "middle" && lab(4L) == "tail",
      s"strata: $lab")
  }

  test("lm ppl features: requireModel fails fast on an empty target") {
    import graft.operators.LangModel
    val d = docsOf(0L -> "the cat", 1L -> "solo")
    // no doc matches -> default path: all-zero features (the oracle's
    // LEFT-JOIN semantics); opt-in guard: loud failure
    val zeros = LangModel.pplFeatures(d, col("doc_id") < 0).collect()
    assert(zeros.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L),
      "empty model must score all-zero on the default path")
    intercept[IllegalArgumentException] {
      LangModel.pplFeatures(d, col("doc_id") < 0, requireModel = true)
    }
    // one-word-only target (no bigram) is ALSO an empty model
    intercept[IllegalArgumentException] {
      LangModel.pplFeatures(d, col("doc_id") === 1L, requireModel = true)
    }
    // non-empty target passes the guard and scores identically
    val guarded = LangModel.pplFeatures(d, col("doc_id") === 0L,
      requireModel = true).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(guarded(0L) == 1L && guarded(1L) == 0L, s"guarded scores: $guarded")
  }

  test("lm ppl features: bigram-LM invariant holds on the real table") {
    import spark.implicits._
    // sum_c1 >= sum_c2 row-wise is NOT an invariant (different hash
    // spaces), but totals over the TARGET slice are: every target
    // bigram contributes 1 to both a context bucket and a bigram
    // bucket, so the model's kind-1 and kind-2 totals are equal
    val st = graft.functions.TextFunctions.textStats(col("text"))
    val enPred = (st.getField("n_stop") / st.getField("n_words")) >= 0.05
    val m = graft.operators.LangModel
      .bigramModel(Tables.documents(spark, sfDir), enPred)
      .groupBy(col("kind")).agg(sum(col("c")).as("tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m(1) == m(2), s"context/bigram totals diverged: $m")
    // and every document appears in the q85 surface exactly once
    assert(q("q85_lm_ppl").count() == Tables.documents(spark, sfDir).count())
  }

  test("source mix: hand-checked rollup (dups, tokens, en) on crafted sources") {
    import spark.implicits._
    val d = Seq(
      // srcA: 3 docs, one exact dup (same text modulo whitespace runs)
      (1L, "the cat is on the mat", "srcA"),
      (2L, "the  cat is  on the mat ", "srcA"), // normalizes equal to doc 1
      (3L, "unique srcA document", "srcA"),
      // srcB: no dups, one clearly non-English doc (no stopwords)
      (4L, "the quick brown fox", "srcB"),
      (5L, "zzz qqq www", "srcB"))
      .toDF("doc_id", "text", "source")
    val r = Quality.sourceMix(d).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    // srcA: 3 docs, doc 2 is the non-canonical dup; tokens 6 + 6 + 4
    // ("srcA" = lowercase run "src" + symbol "A" — uppercase is a
    // symbol in the BPE-ish pattern) = 16; docs 1-2 are stopword-rich,
    // doc 3 has none -> n_en = 2
    assert(r("srcA") == ((3L, 1L, 16L, 2L)), s"srcA: ${r("srcA")}")
    // srcB: no dups; 4+3 = 7 tokens; doc 4 ratio 1/4, doc 5 ratio 0 -> n_en = 1
    assert(r("srcB") == ((2L, 0L, 7L, 1L)), s"srcB: ${r("srcB")}")
  }

  test("source mix on the real table: every source covered, totals consistent") {
    val r = q("q80_source_mix").collect()
    val docs0 = Tables.documents(spark, sfDir)
    assert(r.map(_.getLong(1)).sum == docs0.count())
    assert(r.length == docs0.select("source").distinct().count())
    assert(r.forall(x => x.getLong(2) <= x.getLong(1) && x.getLong(4) <= x.getLong(1)))
  }

  test("gopher repetition: hand-computed coverage on a pathological doc") {
    // "spam spam spam spam spam spam": tot=24 non-space chars, 6 words.
    // 2-grams: 5x "spam spam" (8 chars) -> top2_cov = 5*8 = 40.
    // 5-grams: 2 occurrences of the same gram (20 chars) -> dup5_cov = 40.
    // Both fractions deliberately exceed 1 (overlap double-counting is
    // the documented semantics); keep = 0.
    val r = Quality.gopherRepetition(docsOf(1L -> "spam spam spam spam spam spam"))
      .collect().head
    assert(r.getAs[Int]("n_words") == 6)
    assert(math.abs(r.getAs[Double]("top2_frac") - 40.0 / 24) < 1e-12)
    assert(math.abs(r.getAs[Double]("dup5_frac") - 40.0 / 24) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean_word_len") - 4.0) < 1e-12)
    assert(r.getAs[Int]("keep") == 0)
  }

  test("gopher repetition: clean doc has zero dup5 and integer-exact keep") {
    // All 2-grams and 5-grams unique; top 2-gram by char coverage is
    // "honorificabilitudinitatibus b" (27+1 non-space chars):
    // top2_cov = 1*28 over tot = 37.
    val text = "honorificabilitudinitatibus b c d e f g h i j k"
    val r = Quality.gopherRepetition(docsOf(1L -> text)).collect().head
    assert(r.getAs[Double]("dup5_frac") == 0.0)
    assert(math.abs(r.getAs[Double]("top2_frac") - 28.0 / 37) < 1e-12)
    // 28*5 > 37 -> fails the 0.20 top-2-gram rule
    assert(r.getAs[Int]("keep") == 0)
  }

  test("gopher repetition: docs shorter than the gram sizes still emit rows") {
    val r = Quality.gopherRepetition(docsOf(1L -> "one", 2L -> "two words here four"))
      .orderBy("doc_id").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Double]("top2_frac") == 0.0)
    assert(r(0).getAs[Double]("dup5_frac") == 0.0)
    assert(r(1).getAs[Double]("top2_frac") > 0.0) // has 2-grams
    assert(r(1).getAs[Double]("dup5_frac") == 0.0) // but no 5-grams
  }

  test("pii redaction: counts and placeholders on crafted rows; redacted text is match-free") {
    val d = docsOf(
      1L -> "mail me at bob.smith+x@foo-bar.example.org today",
      2L -> "call 555-1234-5678 or 555-0000-9999 now",
      3L -> "host 10.0.0.1 and 192.168.254.3",
      4L -> "nothing sensitive here",
      5L -> "mixed a@b.co at 1.2.3.4 call 123-4567-8901")
    val r = Quality.redactPii(d, col("text")).orderBy("doc_id").collect()
    assert(r.map(_.getAs[Int]("n_email")).toSeq == Seq(1, 0, 0, 0, 1))
    assert(r.map(_.getAs[Int]("n_phone")).toSeq == Seq(0, 2, 0, 0, 1))
    assert(r.map(_.getAs[Int]("n_ip")).toSeq == Seq(0, 0, 2, 0, 1))
    assert(r(0).getAs[String]("red_text") == "mail me at <EMAIL> today")
    assert(r(1).getAs[String]("red_text") == "call <PHONE> or <PHONE> now")
    assert(r(2).getAs[String]("red_text") == "host <IP> and <IP>")
    assert(r(4).getAs[String]("red_text") == "mixed <EMAIL> at <IP> call <PHONE>")
    // idempotence: nothing PII-shaped survives redaction
    val again = Quality.redactPii(
      Quality.redactPii(d, col("text")).select(col("doc_id"), col("red_text")),
      col("red_text"))
    assert(again.filter(col("n_email") + col("n_phone") + col("n_ip") > 0).isEmpty)
  }

  test("q74 augmentation plants every pii kind and redaction strips each") {
    val out = q("q74_pii_redact")
    // buckets 0/3 plant emails, 1 phones, 2/3 ips — md5 spreads ~uniform,
    // so each kind appears in a 500-doc corpus
    assert(out.filter(col("n_email") > 0).count() > 0)
    assert(out.filter(col("n_phone") > 0).count() > 0)
    assert(out.filter(col("n_ip") > 0).count() > 0)
    // and the redacted text carries the placeholder whenever counted
    assert(out.filter(col("n_email") > 0 && !col("red_text").contains("<EMAIL>")).isEmpty)
    assert(out.filter(col("n_phone") > 0 && !col("red_text").contains("<PHONE>")).isEmpty)
    assert(out.filter(col("n_ip") > 0 && !col("red_text").contains("<IP>")).isEmpty)
  }

  test("top ngrams: deterministic heavy-hitter order on a crafted corpus") {
    val d = docsOf(
      1L -> "to be or not to be",
      2L -> "to be or to be or",
      3L -> "be or not")
    val r = Quality.topNgrams(d, 3, 3).collect()
    // counts: "to be or" 3 (d1:1, d2:2), "be or not" 2 (d1, d3),
    // "be or to" 1, "or not to" 1, "not to be" 1, "or to be" 1
    assert(r(0).getAs[String]("gram") == "to be or" && r(0).getAs[Long]("cnt") == 3)
    assert(r(0).getAs[Long]("n_docs") == 2)
    assert(r(1).getAs[String]("gram") == "be or not" && r(1).getAs[Long]("cnt") == 2)
    // rank-3 is a cnt=1 tie broken by gram ascending
    assert(r(2).getAs[String]("gram") == "be or to")
  }

  test("q73/q75 cover every doc / exactly top-k on the real table") {
    assert(q("q73_gopher_repetition").count() ==
      Tables.documents(spark, sfDir).count())
    assert(q("q75_boilerplate_ngrams").count() == 20)
  }

  test("q78 clean-corpus pipeline: dedup survivors only, repetition rules enforced, redaction applied") {
    import spark.implicits._
    // Gopher's 2-gram rule needs realistic LENGTH: in a short doc one
    // 2-gram trivially covers >20% of the characters
    val ordinary = (1 to 60).map(i => s"w$i").mkString(" ")
    val withPii = (1 to 50).map(i => s"v$i").mkString(" ") +
      " mail bob.smith@example.org or ping 10.0.0.1 today"
    val spam = ("spam " * 40).trim
    val d = docsOf(
      1L -> ordinary,
      2L -> ordinary,  // exact dup of 1
      3L -> spam,      // fails the 2-gram rule
      4L -> withPii)
    val r = Quality.cleanCorpus(d)
    val rows = r.collect().map(x => x.getLong(0) -> (x.getString(1), x.getLong(2))).toMap
    assert(rows.keySet == Set(1L, 4L), s"survivor set wrong: ${rows.keySet}")
    assert(rows(4L)._1.contains("<EMAIL>") && rows(4L)._1.contains("<IP>"))
    assert(rows(1L)._2 > 0)
  }

  test("DSIR: hand-computed log weights on a tiny corpus") {
    import graft.operators.Dsir
    // target = docs containing stopword mass; weights must equal the
    // add-one-smoothed multinomial log-likelihood ratio computed by
    // hand from the same bucket counts
    val d = docsOf(
      1L -> "the cat", 2L -> "the dog", 3L -> "zq xv", 4L -> "zq zq")
    val pred = col("text").startsWith("the")
    val model = Dsir.bucketModel(d, pred).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dt = model.values.map(_._1).sum.toDouble + Dsir.NumBuckets
    val dr = model.values.map(_._2).sum.toDouble + Dsir.NumBuckets
    def h(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val dig = md.digest(g.getBytes("UTF-8"))
      val v = (0 until 6).foldLeft(0L)((a, i) => (a << 8) | (dig(i) & 0xffL))
      v % Dsir.NumBuckets
    }
    def refW(text: String): Double = {
      val ws = text.split(" ", -1)
      val feats = ws.toSeq ++ ws.sliding(2).map(_.mkString(" ")).toSeq
      feats.map { g =>
        val (nt, nr) = model(h(g))
        math.log(nt + 1.0) - math.log(dt) - math.log(nr + 1.0) + math.log(dr)
      }.sum
    }
    val got = Dsir.logWeights(d, pred).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Seq(1L -> "the cat", 2L -> "the dog", 3L -> "zq xv", 4L -> "zq zq")
      .foreach { case (id, t) =>
        assert(math.abs(got(id) - refW(t)) < 1e-9, s"doc $id: ${got(id)} vs ${refW(t)}")
      }
    // target-like docs carry strictly higher weight
    assert(got(1L) > got(3L) && got(2L) > got(4L))
  }

  test("DSIR: deterministic Gumbel top-m prefers the target-like slice") {
    import spark.implicits._
    import graft.operators.Dsir
    // 40 stopword-rich docs vs 40 marker-noise docs; target = en-like
    val rows = (1L to 40L).map(i => (i, s"the cat and the dog of m$i")) ++
      (41L to 80L).map(i => (i, s"zq$i xv$i qk$i wj$i yb$i nn$i pp$i rr$i"))
    val d = rows.toDF("doc_id", "text")
    val st = graft.functions.TextFunctions.textStats(col("text"))
    val pred = (st.getField("n_stop") / st.getField("n_words")) >= 0.05
    val s1 = Dsir.select(d, pred, 20, seed = 7L).collect()
    val s2 = Dsir.select(d, pred, 20, seed = 7L).collect()
    assert(s1.map(_.getLong(0)).toSeq == s2.map(_.getLong(0)).toSeq,
      "selection not deterministic across runs")
    val enPicked = s1.count(_.getLong(0) <= 40L)
    assert(enPicked >= 16, s"expected the en-like slice to dominate, got $enPicked/20")
  }

  test("RepetitionStats: native byte scan equals the composed reference on adversarial strings") {
    import spark.implicits._
    // plain-Scala reference of the composed split/gram-count shape —
    // code POINTS (length() semantics), split keeping empty segments
    def ref(trimmed: String): (Int, Long, Long, Long) = {
      val ws = trimmed.split(" ", -1)
      val cp = (s: String) => s.codePointCount(0, s.length).toLong
      val tot = cp(trimmed) - (ws.length - 1)
      def grams(n: Int): Map[String, Long] =
        if (ws.length < n) Map.empty
        else ws.sliding(n).map(_.mkString(" ")).toSeq.groupBy(identity)
          .view.mapValues(_.size.toLong).toMap
      val top2 = grams(2).map { case (g, c) => c * (cp(g) - 1) }.maxOption.getOrElse(0L)
      val dup5 = grams(5).collect { case (g, c) if c > 1 => c * (cp(g) - 4) }.sum
      (ws.length, tot, top2, dup5)
    }
    val rnd = new scala.util.Random(37)
    // vocab stresses multibyte (2-, 3-, 4-byte = surrogate pair) chars
    // and repeats; joins use occasional double spaces (empty segments)
    val vocab = Vector("a", "spam", "héllo", "日本語", "👍👍", "x y".take(1), "bb")
    val texts = (1 to 300).map { _ =>
      val k = rnd.nextInt(12)
      (1 to k).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
    } :+ "" :+ " " :+ "  " :+ "spam spam spam spam spam spam spam"
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = df
      .select(col("doc_id"), graft.plans.RepetitionStats(trim(col("text"))).as("st"))
      .select(col("doc_id"), col("st.n_words"), col("st.tot"),
        col("st.top2_cov"), col("st.dup5_cov"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val trimmed = { var s = t; while (s.startsWith(" ")) s = s.substring(1)
        while (s.endsWith(" ")) s = s.substring(0, s.length - 1); s }
      assert(got(i.toLong) == ref(trimmed), s"mismatch on ${trimmed.take(60)}")
    }
  }
}
