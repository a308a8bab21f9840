package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Exact._
import graft.functions.EventFunctions._

/** Dev probe: q01 decimal-chain vs unscaled-long arithmetic, and q56
  * expand-distinct vs two-level aggregation — the round-8 perf A/B
  * (same JVM, interleaved, min-of-iters; this host has external
  * contention windows that make cross-JVM comparison meaningless).
  */
object ProfileQ01 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def li = Tables.lineitem(spark, dir).filter($"l_shipdate" <= lit("2000-12-01"))

    // A: current decimal chain
    def q01A = li.groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sumDec(d2($"l_quantity"), 2).as("sum_qty"),
        sumDec(d2($"l_extendedprice"), 2).as("sum_base_price"),
        sumDec(discPrice($"l_extendedprice", $"l_discount"), 4).as("sum_disc_price"),
        sumDec(charge($"l_extendedprice", $"l_discount", $"l_tax"), 6).as("sum_charge"),
        count(lit(1)).as("count_order"))

    // B: unscaled-long arithmetic (round(x*100) as long)
    def u2(c: org.apache.spark.sql.Column) = round(c * lit(100)).cast("long")
    def q01B = {
      val p2 = u2($"l_extendedprice")
      val dsc = u2($"l_discount"); val tax = u2($"l_tax")
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          (sum(u2($"l_quantity")).cast("double") / lit(100.0)).as("sum_qty"),
          (sum(p2).cast("double") / lit(100.0)).as("sum_base_price"),
          (sum(p2 * (lit(100L) - dsc)).cast("double") / lit(1e4)).as("sum_disc_price"),
          (sum(p2 * (lit(100L) - dsc) * (lit(100L) + tax)).cast("double") / lit(1e6)).as("sum_charge"),
          count(lit(1)).as("count_order"))
    }

    // scan floor: same columns, trivial agg
    def q01floor = li.groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity").as("s1"), sum($"l_extendedprice").as("s2"),
        sum($"l_discount").as("s3"), sum($"l_tax").as("s4"),
        count(lit(1)).as("c"))

    def ev = norm(Tables.events(spark, dir))

    // A: current q56 (two countDistinct → Expand)
    def q56A = ev.groupBy(col("instance_id"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(isMsg, lit(1))).as("n_messages"),
        count(when(isCmd, lit(1))).as("n_commands"),
        countDistinct(col("user_id")).as("n_participants"),
        countDistinct(when(isMsg || isCmd, col("user_id"))).as("n_actors"),
        sum(when(isMsg, d2(col("value")))).cast("double").as("_sum_msg_len"))

    // B: two-level aggregation, no Expand
    def q56B = ev
      .groupBy(col("instance_id"), col("user_id"))
      .agg(
        count(lit(1)).as("ne_u"),
        count(when(isMsg, lit(1))).as("nm_u"),
        count(when(isCmd, lit(1))).as("nc_u"),
        sum(when(isMsg, u2(col("value")))).as("len_u"))
      .groupBy(col("instance_id"))
      .agg(
        sum(col("ne_u")).as("n_events"),
        sum(col("nm_u")).as("n_messages"),
        sum(col("nc_u")).as("n_commands"),
        count(lit(1)).as("n_participants"),
        count(when(col("nm_u") + col("nc_u") > 0, lit(1))).as("n_actors"),
        (sum(col("len_u")).cast("double") / lit(100.0)).as("_sum_msg_len"))

    // C: round() codegens to BigDecimal.setScale per value; for
    // non-negative 2dp sources HALF_UP == floor(x*100+0.5), and a
    // double→long CAST truncates toward zero == floor for positives.
    def u2c(c: org.apache.spark.sql.Column) = (c * lit(100) + lit(0.5)).cast("long")
    def q01C = {
      val p2 = u2c($"l_extendedprice")
      val dsc = u2c($"l_discount"); val tax = u2c($"l_tax")
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          (sum(u2c($"l_quantity")).cast("double") / lit(100.0)).as("sum_qty"),
          (sum(p2).cast("double") / lit(100.0)).as("sum_base_price"),
          (sum(p2 * (lit(100L) - dsc)).cast("double") / lit(1e4)).as("sum_disc_price"),
          (sum(p2 * (lit(100L) - dsc) * (lit(100L) + tax)).cast("double") / lit(1e6)).as("sum_charge"),
          count(lit(1)).as("count_order"))
    }
    def q56C = ev
      .groupBy(col("instance_id"), col("user_id"))
      .agg(
        count(lit(1)).as("ne_u"),
        count(when(isMsg, lit(1))).as("nm_u"),
        count(when(isCmd, lit(1))).as("nc_u"),
        sum(when(isMsg, u2c(col("value")))).as("len_u"))
      .groupBy(col("instance_id"))
      .agg(
        sum(col("ne_u")).as("n_events"),
        sum(col("nm_u")).as("n_messages"),
        sum(col("nc_u")).as("n_commands"),
        count(lit(1)).as("n_participants"),
        count(when(col("nm_u") + col("nc_u") > 0, lit(1))).as("n_actors"),
        (sum(col("len_u")).cast("double") / lit(100.0)).as("_sum_msg_len"))

    for (i <- 1 to 4) {
      time(s"q01_floor  i$i")(noop(q01floor))
      time(s"q01_decimal i$i")(noop(q01A))
      time(s"q01_long    i$i")(noop(q01B))
      time(s"q01_cast    i$i")(noop(q01C))
      time(s"q56_expand  i$i")(noop(q56A))
      time(s"q56_2level  i$i")(noop(q56B))
      time(s"q56_2lcast  i$i")(noop(q56C))
    }
    spark.stop()
  }
}
