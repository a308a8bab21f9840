package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.operators.ExternalScorer

/** Harness semantics of the external-classifier shape
  * (distill3b_ic_classifier_gpt.py): heuristic short-circuit, 200-word
  * truncation, bounded retry, threshold gate, and checksum-gated
  * caching — all against planted scorer stubs that count their calls.
  */
object ScorerProbe {
  val calls = new AtomicInteger(0)
  val prompts = new ConcurrentHashMap[String, Integer]()
  def record(batch: Seq[String]): Unit = {
    calls.incrementAndGet()
    batch.foreach(p => prompts.merge(p, 1, (a, b) => a + b))
  }
  def reset(): Unit = { calls.set(0); prompts.clear() }
  def seen(p: String): Int = Option(prompts.get(p)).fold(0)(_.intValue)
}

class ExternalScorerSpec extends SparkTestBase {
  import spark.implicits._

  override protected def afterEach(): Unit = {
    ScorerProbe.reset(); super.afterEach()
  }

  private val steady: ExternalScorer.ScoreFn = { batch =>
    ScorerProbe.record(batch)
    batch.map(p => ("in-character", 0.9))
  }

  test("heuristic pre-gate rows never reach the scorer") {
    val df = Seq(
      (1L, "a perfectly fine utterance"),
      (2L, "OOC: this is out of game"),
      (3L, "(whispers something)"),
      (4L, ""),
      (5L, "another fine one")).toDF("id", "text")
    // NB no .orderBy on the scored plan: a global sort's range-sampling
    // pass would execute the scorer TWICE (see the score() cost
    // warning) — sort driver-side instead, and count exact sightings.
    val out = ExternalScorer.score(df, col("text"), steady)
      .collect().sortBy(_.getLong(0))
    assert(out.map(r => (r.getLong(0), r.getString(2))).toSeq == Seq(
      1L -> "in-character", 2L -> "out-of-character", 3L -> "out-of-character",
      4L -> "out-of-character", 5L -> "in-character"))
    assert(out.filter(_.getString(2) == "out-of-character").forall(_.getDouble(3) == 1.0))
    assert(ScorerProbe.seen("a perfectly fine utterance") == 1)
    assert(ScorerProbe.seen("OOC: this is out of game") == 0)
    assert(ScorerProbe.seen("(whispers something)") == 0)
  }

  test("prompts are truncated to the first 200 words") {
    val longText = (1 to 250).map(i => s"w$i").mkString(" ")
    val expected = (1 to 200).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, longText)).toDF("id", "text")
    ExternalScorer.score(df, col("text"), steady).collect()
    assert(ScorerProbe.seen(expected) == 1)
    assert(ScorerProbe.seen(longText) == 0)
  }

  test("junk labels retry up to 3 attempts; a flaky row recovers, a dead row nulls out") {
    // flaky: junk on the first two sightings, valid on the third;
    // dead: junk forever -> label null, prob 1 (the reference's None, 1)
    val flakyScorer: ExternalScorer.ScoreFn = { batch =>
      ScorerProbe.record(batch)
      batch.map {
        case p if p == "flaky utterance please score" =>
          if (ScorerProbe.seen(p) < 3) ("garbage", 0.5) else ("mixed", 0.7)
        case p if p == "dead utterance please score" => ("garbage", 0.5)
        case _ => ("in-character", 0.9)
      }
    }
    val df = Seq(
      (1L, "flaky utterance please score"),
      (2L, "dead utterance please score"),
      (3L, "healthy utterance please score")).toDF("id", "text")
    val out = ExternalScorer.score(df, col("text"), flakyScorer, batchSize = 8)
      .collect().sortBy(_.getLong(0))
    assert(out(0).getString(2) == "mixed" && out(0).getDouble(3) == 0.7)
    assert(out(1).isNullAt(2) && out(1).getDouble(3) == 1.0)
    assert(out(2).getString(2) == "in-character")
    assert(ScorerProbe.seen("flaky utterance please score") == 3)
    assert(ScorerProbe.seen("dead utterance please score") == 3)
    assert(ScorerProbe.seen("healthy utterance please score") == 1)
  }

  test("a throwing call fails only that batch's attempt and is retried") {
    val throwing: ExternalScorer.ScoreFn = { batch =>
      ScorerProbe.record(batch)
      if (ScorerProbe.calls.get() == 1) throw new RuntimeException("http 500")
      batch.map(_ => ("in-character", 0.95))
    }
    val df = Seq((1L, "needs the remote scorer")).toDF("id", "text")
      .repartition(1)
    val out = ExternalScorer.score(df, col("text"), throwing).collect()
    assert(out.head.getString(2) == "in-character")
    assert(ScorerProbe.calls.get() == 2)
  }

  test("few-shot prefix reaches every remote prompt, never heuristic rows (fewshot_predict.py:40-53)") {
    val df = Seq((1L, "a fine utterance"), (2L, "OOC: local answer")).toDF("id", "text")
    ExternalScorer.score(df, col("text"), steady, fewshotPrefix = "SHOT1\n\nSHOT2\n\n")
      .collect()
    assert(ScorerProbe.seen("SHOT1\n\nSHOT2\n\na fine utterance") == 1)
    assert(ScorerProbe.seen("a fine utterance") == 0)
    assert(ScorerProbe.calls.get() == 1) // the OOC row answered locally
  }

  test("prompt length gate drops >8000-char prompts before any call (utt_cmd_test_predictions.py:44-46)") {
    val long = "x" * (ExternalScorer.MaxPromptChars + 1)
    val df = Seq((1L, "short enough"), (2L, long)).toDF("id", "text")
    val kept = df.filter(ExternalScorer.promptLengthOk(col("text")))
    assert(kept.collect().map(_.getLong(0)).toSeq == Seq(1L))
    ExternalScorer.score(kept, col("text"), steady).collect()
    assert(ScorerProbe.seen("short enough") == 1)
    assert(ScorerProbe.calls.get() == 1)
  }

  test("icFilter keeps only in-character with prob > 0.8 (distill3b:70-76)") {
    val scored = Seq(
      (1L, "in-character", 0.95), (2L, "in-character", 0.8),
      (3L, "mixed", 0.99), (4L, "out-of-character", 1.0)
    ).toDF("id", "label", "prob")
    assert(scored.filter(ExternalScorer.icFilter).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("score() runs under Structured Streaming: per-micro-batch scoring + ic gate") {
    // the distill3b stage live: a stream of utterances scored as they
    // arrive (mapPartitions is stateless, so the harness drops into a
    // streaming plan unchanged), the keep-gate applied downstream
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)]
    val scored = ExternalScorer.score(
      input.toDS().toDF("id", "text"), col("text"), steady)
    val query = scored.filter(ExternalScorer.icFilter)
      .writeStream.format("memory").queryName("scored_out").outputMode("append").start()
    try {
      input.addData((1L, "fine stream utterance"), (2L, "OOC: skip me"))
      query.processAllAvailable()
      input.addData((3L, "(aside)"), (4L, "another fine one"))
      query.processAllAvailable()
      val kept = spark.table("scored_out").select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(kept == Seq(1L, 4L))
      assert(ScorerProbe.seen("fine stream utterance") == 1)
      assert(ScorerProbe.seen("OOC: skip me") == 0)
    } finally query.stop()
  }

  test("scoreCached never re-scores an unchanged corpus; content change invalidates") {
    val dir = java.nio.file.Files.createTempDirectory("scorer_cache").toString
    val df = Seq((1L, "cacheable utterance one"), (2L, "cacheable utterance two"))
      .toDF("id", "text")
    val first = ExternalScorer.scoreCached(df, col("text"), steady, dir).collect()
    val callsAfterFirst = ScorerProbe.calls.get()
    assert(callsAfterFirst > 0)
    val second = ExternalScorer.scoreCached(df, col("text"), steady, dir).collect()
    assert(ScorerProbe.calls.get() == callsAfterFirst, "rerun must hit the cache")
    assert(second.map(_.toSeq).toSet == first.map(_.toSeq).toSet)

    val changed = Seq((1L, "cacheable utterance one"), (2L, "now different text"))
      .toDF("id", "text")
    ExternalScorer.scoreCached(changed, col("text"), steady, dir).collect()
    assert(ScorerProbe.calls.get() > callsAfterFirst, "changed content must re-score")
  }
}
