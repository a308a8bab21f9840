package graft

import org.apache.spark.sql.functions._

import graft.functions.Exact.{discPriceU, sumU}

/** Dev probe: interleaved A/B of the q02 join orders (fact⋈orders⋈cust
  * vs fact⋈(orders⋈cust)) — same JVM, alternating, so host-contention
  * windows hit both shapes equally. */
object ProfileQ02AB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STAGE $label $dt%.2f s"); dt
    }
    def c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    def o = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-06-01"))
    def l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1998-06-01"))

    def finish(j: org.apache.spark.sql.DataFrame) = j
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sumU(discPriceU(col("l_extendedprice"), col("l_discount")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
      .limit(10)
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))

    def oldShape = finish(
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey")))
    def newShape = finish(
      l.join(
        o.join(c, col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey")))

    time("warmA")(oldShape); time("warmB")(newShape)
    val as = (1 to 6).map(i => time(s"A_old i$i")(oldShape))
    val bs = (1 to 6).map(i => time(s"B_new i$i")(newShape))
    val as2 = (1 to 6).map(i => time(s"A_old2 i$i")(oldShape))
    val bs2 = (1 to 6).map(i => time(s"B_new2 i$i")(newShape))
    println(f"MIN old ${(as ++ as2).min}%.2f new ${(bs ++ bs2).min}%.2f")
    spark.stop()
  }
}
