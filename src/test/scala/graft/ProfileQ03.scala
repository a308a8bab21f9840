package graft

import org.apache.spark.sql.functions._

/** Dev probe: q03 (TPC-H Q5) plan variants at sf10. */
object ProfileQ03 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf10")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    import spark.implicits._
    import graft.functions.Exact._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def r = Tables.region(spark, dir).filter($"r_name" === "ASIA")
    def n = Tables.nation(spark, dir)
    def c = Tables.customer(spark, dir)
    def o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01") && $"o_orderdate" < lit("1997-01-01"))
    def l = Tables.lineitem(spark, dir)
    def sup = Tables.supplier(spark, dir)

    def current = SparkEntry.queries("q03_regional_revenue")(spark, dir)

    // variant B: slim (orderkey, nationkey) via o ⋈ bc(c ⋈ bc(n) ⋈ bc(r)),
    // then ONE lineitem co-shuffle join, bc(sup) on (suppkey, nationkey)
    def variantB = {
      val cAsia = c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .select($"c_custkey", $"c_nationkey", $"n_name")
      val oc = o.join(broadcast(cAsia), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_nationkey", $"n_name")
      l.join(oc, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(sup.select($"s_suppkey", $"s_nationkey")),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .groupBy($"n_name")
        .agg(sumU(discPriceU($"l_extendedprice", $"l_discount"), 4).as("revenue"))
        .orderBy($"revenue".desc, $"n_name".asc)
    }
    // variant C: like B but oc is also BROADCAST into lineitem (zero
    // fact shuffle; only sane when one year of orders fits a broadcast)
    def variantC = {
      val cAsia = c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .select($"c_custkey", $"c_nationkey", $"n_name")
      val oc = o.join(broadcast(cAsia), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_nationkey", $"n_name")
      l.join(broadcast(oc), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(sup.select($"s_suppkey", $"s_nationkey")),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .groupBy($"n_name")
        .agg(sumU(discPriceU($"l_extendedprice", $"l_discount"), 4).as("revenue"))
        .orderBy($"revenue".desc, $"n_name".asc)
    }
    for (i <- 1 to 3) {
      val a = time("current")(current.collect())
      val b = time("variantB")(variantB.collect())
      val cc = time("variantC")(variantC.collect())
      if (i == 1) {
        println("EQ_B=" + (a.toSeq == b.toSeq) + " EQ_C=" + (a.toSeq == cc.toSeq))
      }
      Verify.releaseQueryState(spark)
    }
    spark.stop()
  }
}
