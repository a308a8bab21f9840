package graft

import org.apache.spark.sql.functions._

import graft.plans.FirstInt

/** FirstInt must byte-match CAST(regexp_extract(s,'(\d+)',1) AS INT)
  * — the form the DuckDB oracle still runs — on every in-domain
  * input, and return NULL (not fault) outside the INT domain. */
class FirstIntSpec extends SparkTestBase {

  test("equals the regex chain on the real events table") {
    val ev = Tables.events(spark, sfDir)
      .withColumn("native", FirstInt(col("props")))
      .withColumn("regex",
        regexp_extract(col("props"), "(\\d+)", 1).cast("int"))
    assert(ev.filter(not(col("native") <=> col("regex"))).isEmpty)
    // Contract check only: NULL exactly when props holds no in-range
    // digit run. (No blanket no-nulls assertion — whether every props
    // row contains a digit is a property of the data drop, not of
    // FirstInt; the <=> equivalence above already covers NULL rows.)
  }

  test("boundary cases: no digits, empty, leading/trailing, multibyte, null") {
    import spark.implicits._
    val rows = Seq(
      """{"k": 42}""" -> Some(42),
      "7" -> Some(7),
      "abc123def456" -> Some(123), // first run only
      "no digits here" -> None,
      "" -> None,
      "é∂å 99 ∑" -> Some(99), // digits after multibyte chars
      "00123" -> Some(123), // leading zeros parse numerically
      "2147483647" -> Some(Int.MaxValue),
      "2147483648" -> None, // INT overflow -> NULL, not fault
      "999999999999999999999999999" -> None // would overflow LONG too
    )
    val df = rows.map(_._1).toDF("s").withColumn("v", FirstInt(col("s")))
    val got = df.select("v").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    assert(got == rows.map(_._2))
    val nulls = Seq(Option.empty[String]).toDF("s")
      .select(FirstInt(col("s")).as("v")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val inputs = Seq("""{"k": 314}""", "x9y", "none", "", "2147483648")
    val viaEval = inputs.map { s =>
      Option(FirstInt(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))).eval(null))
    }
    val viaCodegen = inputs.toDF("s").select(FirstInt(col("s")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    assert(viaEval.map(_.map(_.asInstanceOf[Int])) == viaCodegen)
  }
}
