package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dsir, Quality}

/** The q97 quality classifier's spec-gated half (the q58 house
  * split): the LBFGS fit, the in-row sigmoid scorer, and the
  * threshold filter — everything the oracle's int64 design surface
  * can't cover. */
class QualityClassifierSpec extends SparkTestBase {

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // stopword-rich "quality" text vs junk; the stopword-ratio
  // exemplar predicate (the q76/q97 one)
  private def enPred = {
    val st = graft.functions.TextFunctions.textStats(col("text"))
    (st.getField("n_stop") / st.getField("n_words")) >= 0.05
  }

  private val corpus = docsOf(
    (0L, "the cat is on the mat and it is warm"),
    (1L, "it was the best of times and the worst of times"),
    (2L, "she is at the door and he is not"),
    (3L, "to be or not to be that is the question"),
    (4L, "zxq vvk jjr pqm wzx nnt"),
    (5L, "qqa bbz ccx ddw eev ffu"),
    (6L, "ggh hhi iij jjk kkl llm"),
    (7L, "mzp nzq ozr pzs qzt rzu"))

  test("design surface: counts, label, balanced weight (hand-checked)") {
    val d = docsOf((0L, "a b a"), (1L, "c d"))
    val r = Quality.classifierDesign(d, col("doc_id") === 0L).collect()
    // doc 0: unigrams a,b,a + bigrams "a b","b a" -> bucket of 'a'
    // has n_occ 2; every doc-0 row has y=1, w = 2/(2*1) = 1.0;
    // doc-1 rows y=0, w = 2/(2*1) = 1.0
    val aBucket = d.select(element_at(
      Dsir.featureBuckets(trim(col("text"))), 1)).first().getLong(0)
    val d0 = r.filter(_.getLong(0) == 0L)
    assert(d0.nonEmpty && d0.forall(x => x.getDouble(3) == 1.0 && x.getDouble(4) == 1.0))
    assert(d0.count(x => x.getLong(1) == aBucket && x.getLong(2) == 2L) == 1,
      s"unigram 'a' should have n_occ 2: ${d0.mkString(";")}")
    val d1 = r.filter(_.getLong(0) == 1L)
    assert(d1.nonEmpty && d1.forall(x => x.getDouble(3) == 0.0 && x.getDouble(4) == 1.0))
  }

  test("fit is deterministic and learns the planted preference") {
    val m1 = Quality.classifierFit(corpus, enPred)
    val m2 = Quality.classifierFit(corpus, enPred)
    // FIXED-PARTITIONING determinism, not bitwise: LBFGS's
    // treeAggregate float sums can combine in task-completion order,
    // so on larger clusters re-fits may differ in low-order bits —
    // the contract is coefficient stability to 1e-9, which is what
    // the scorer's planted-preference decisions actually rest on
    val tol = 1e-9
    assert(m1.weights.zip(m2.weights).forall { case (a, b) =>
      math.abs(a - b) <= tol } && math.abs(m1.intercept - m2.intercept) <= tol,
      "re-fit on identical input moved the coefficients by > 1e-9")
    // held-out docs, not in the training corpus
    val held = docsOf(
      // exemplar-like: reuses trained stopword buckets (the/is/and/it)
      (100L, "the dog is in the house and it is dry"),
      // junk-like: reuses trained junk buckets (a NEVER-seen token
      // has a zero weight and would score sigma(intercept) ~ 0.5 —
      // the filter decision must rest on learned weights, not the
      // intercept's sign)
      (101L, "zxq vvk qqa bbz ggh hhi"))
    val scored = held
      .withColumn("p", Quality.classifierScore(col("text"), m1))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(100L) > scored(101L),
      s"exemplar-like doc must outscore junk: $scored")
    val kept = Quality.classifierFilter(held, m1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(100L) && !kept.contains(101L),
      s"filter at 0.5 must keep the exemplar-like doc only, got $kept")
  }

  test("in-row scorer equals the sparse explode+join scoring") {
    val m = Quality.classifierFit(corpus, enPred)
    val spark2 = spark
    import spark2.implicits._
    val wdf = m.weights.zipWithIndex
      .map { case (w, b) => (b.toLong, w) }.toSeq.toDF("bucket", "wt")
    val sparse = corpus
      .select(col("doc_id"),
        explode(Dsir.featureBuckets(trim(col("text")))).as("bucket"))
      .join(broadcast(wdf), Seq("bucket"))
      .groupBy(col("doc_id")).agg(sum(col("wt")).as("z"))
      .withColumn("p_sparse",
        lit(1.0) / (lit(1.0) + exp(-(col("z") + lit(m.intercept)))))
    val inRow = corpus
      .withColumn("p", Quality.classifierScore(col("text"), m))
      .select(col("doc_id"), col("p"))
    val joined = inRow.join(sparse.select(col("doc_id"), col("p_sparse")),
      Seq("doc_id")).collect()
    assert(joined.length == 8)
    joined.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9,
        s"doc ${r.getLong(0)}: in-row ${r.getDouble(1)} != sparse ${r.getDouble(2)}")
    }
  }

  test("null text scores null and is dropped by the filter") {
    val spark2 = spark
    import spark2.implicits._
    val d = Seq((0L, Option("the cat is here and it is fine")),
      (1L, Option.empty[String])).toDF("doc_id", "text")
    val m = Quality.classifierFit(corpus, enPred)
    val kept = Quality.classifierFilter(d, m, threshold = 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L), "NULL text must not pass the filter")
  }
}
