package graft

import org.apache.spark.sql.functions._

import graft.functions.Exact.{discPriceU, sumU}

/** Dev probe: stage decomposition of q02 (TPC-H Q3 shape) at sf1. */
object ProfileQ02 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    def o = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-06-01"))
    def l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1998-06-01"))
    def oq = o.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"))

    // A: lineitem scan+filter only
    def a = l.select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    // B: the qualified-orders build side alone
    def b = oq
    // C: A + join
    def cJ = l.join(oq, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("o_orderdate"), col("l_extendedprice"), col("l_discount"))
    // D: C + aggregation
    def d = cJ.groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sumU(discPriceU(col("l_extendedprice"), col("l_discount")), 4).as("revenue"))
    // E: full query with TopK
    def e = d.orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
      .limit(10)

    for (i <- 1 to 3) {
      time(s"A_lscan  i$i")(noop(a))
      time(s"B_build  i$i")(noop(b))
      time(s"C_join   i$i")(noop(cJ))
      time(s"D_agg    i$i")(noop(d))
      time(s"E_full   i$i")(noop(e))
    }
    spark.stop()
  }
}
