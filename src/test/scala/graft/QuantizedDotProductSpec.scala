package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.plans.QuantizedDotProduct

/** The native Catalyst expression must byte-match the built-ins-only
  * chain on real data (both codegen and interpreted paths). */
class QuantizedDotProductSpec extends SparkTestBase {

  test("native expression equals the built-in chain on all embedding pairs") {
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val a = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("eb"))
    val pairs = a.join(b, col("a") < col("b"))
      .withColumn("native", VectorFunctions.dotQ(col("ea"), col("eb")))
      .withColumn("chain", VectorFunctions.dotQChain(col("ea"), col("eb")))
    assert(pairs.filter(col("native") =!= col("chain")).isEmpty)
    assert(pairs.filter(col("native").isNull).isEmpty)
  }

  test("SQL registration via GraftExtensions: quantized_dot callable from SQL text") {
    val got = spark.sql(
      """SELECT quantized_dot(
        |  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d""".stripMargin)
      .first().getLong(0)
    assert(got == 10000000L * 30000000L + 20000000L * 40000000L)
    val err = intercept[Exception] {
      spark.sql("SELECT quantized_dot(array(CAST(1.0 AS FLOAT)))").collect()
    }
    assert(err.getMessage.contains("2 arguments") || err.getMessage.contains("quantized_dot"))
  }

  test("interpreted path (eval) matches codegen and handles nulls/mismatch") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (Array(-0.5f, 0.25f), Array(0.5f, -0.25f))
    ).toDF("x", "y")
    val got = df.select(QuantizedDotProduct(col("x"), col("y")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    // floor semantics: 1e7*2e7*... exact integers for these values
    assert(got == Seq(
      10000000L * 30000000L + 20000000L * 40000000L,
      -5000000L * 5000000L + 2500000L * -2500000L))
    val mism = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("x", "y")
      .select(QuantizedDotProduct(col("x"), col("y")).as("d")).collect()
    assert(mism.head.isNullAt(0))
  }
}
