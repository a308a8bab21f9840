package graft

import org.apache.spark.sql.functions._

import graft.functions.EventFunctions._
import graft.functions.Exact.{sumU, u2}

/** Dev probe: stage decomposition of the q56 profile aggregation —
  * which part of scan → norm → two-level agg costs the wall-clock.
  */
object ProfileQ56 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.bench/sf1")
    val spark = GraftSession.local("32", "32", logLevel = "ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def ev = norm(Tables.events(spark, dir))

    // A: norm + 1-row count — scan/regex floor
    def a = ev.agg(count(lit(1)))
    // B: level-1 only (counts, no value sum)
    def b = ev.groupBy(col("instance_id"), col("user_id"))
      .agg(count(lit(1)).as("_ne_u"),
        count(when(isMsg, lit(1))).as("_nm_u"),
        count(when(isCmd, lit(1))).as("_nc_u"))
    // C: level-1 with the u2 sum
    def c = ev.groupBy(col("instance_id"), col("user_id"))
      .agg(count(lit(1)).as("_ne_u"),
        count(when(isMsg, lit(1))).as("_nm_u"),
        count(when(isCmd, lit(1))).as("_nc_u"),
        sum(when(isMsg, u2(col("value")))).as("_len_u"))
    // D: full two-level profile
    def d = c.groupBy(col("instance_id"))
      .agg(sum(col("_ne_u")).as("n_events"),
        sum(col("_nm_u")).as("n_messages"),
        sum(col("_nc_u")).as("n_commands"),
        count(lit(1)).as("n_participants"),
        count(when(col("_nm_u") + col("_nc_u") > 0, lit(1))).as("n_actors"),
        sumU(col("_len_u"), 2).as("_sum_msg_len"))
    // E: level-1 keyed agg, single count only (q16 shape)
    def e = ev.groupBy(col("instance_id"), col("user_id")).agg(count(lit(1)))
    // F: norm minus regex — is it the regex or the agg?
    def f = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)))

    for (i <- 1 to 3) {
      time(s"A_scanfloor i$i")(noop(a))
      time(s"B_l1counts  i$i")(noop(b))
      time(s"C_l1sum     i$i")(noop(c))
      time(s"D_full      i$i")(noop(d))
      time(s"E_l1single  i$i")(noop(e))
      time(s"F_noregex   i$i")(noop(f))
    }
    spark.stop()
  }
}
