package graft

/** Every-query smoke gate: materialize each SparkEntry.queries entry
  * on the driver's sf0.001 testdata. This is the cheapest local
  * mirror of the driver's correctness harness surface — a schema
  * drift in a fresh data drop (round 8: events.ts silently switched
  * TIMESTAMP(NANOS) → TIMESTAMP(MICROS) and every event query threw
  * DATATYPE_MISMATCH at plan time) fails HERE, in-round, instead of
  * in the between-rounds driver run. Value correctness lives with the
  * DuckDB oracle; this asserts analyzability + executability only.
  */
class SmokeSpec extends SparkTestBase {

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on the driver testdata") {
      val df = fn(spark, sfDir)
      // noop write executes the full plan without collecting to the
      // driver; schema access forces analysis even for empty results.
      assert(df.schema.fields.nonEmpty)
      df.write.format("noop").mode("overwrite").save()
    }
  }

  test("entry() flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
