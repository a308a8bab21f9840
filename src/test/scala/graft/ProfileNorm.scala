package graft

import org.apache.spark.sql.functions._

/** Dev probe: cost of the norm() projection's instance_id extraction —
  * Java regexp_extract vs cheaper portable forms — over the sf1
  * events table (every §B/bonus events query pays this per row).
  */
object ProfileNorm {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def ev = Tables.events(spark, dir)

    // A: current — regexp_extract per row
    def a = ev.select(
      regexp_extract(col("props"), "(\\d+)", 1).cast("int").as("instance_id"))
    // B: substring arithmetic on the fixed '{"k": N}' layout —
    // NOT layout-robust, baseline only
    def b = ev.select(
      substring(col("props"), 7, 12).cast("string").pipe(c =>
        regexp_replace(c, "[^0-9]", "")).cast("int").as("instance_id"))
    // C: get_json_object
    def c = ev.select(
      get_json_object(col("props"), "$.k").cast("int").as("instance_id"))
    // D: from_json
    def d = ev.select(
      from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType)))).getField("k").as("instance_id"))
    // E: scan floor — no extraction
    def e = ev.select(length(col("props")).as("instance_id"))

    for (i <- 1 to 3) {
      time(s"regex  i$i")(noop(a))
      time(s"json_path i$i")(noop(c))
      time(s"from_json i$i")(noop(d))
      time(s"floor  i$i")(noop(e))
    }
    spark.stop()
  }

  implicit class Piper[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }
}
