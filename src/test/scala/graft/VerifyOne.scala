package graft
import java.nio.file.{Files, Paths}
/** Dev probe: Verify for a SUBSET of queries — same dump + oracle
  * surface as graft.Verify (shared escape + cleanup helpers, so the
  * two can never diverge); tools/check.py works on the outDir. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSeq
    val spark = GraftSession.local("8", "8", logLevel = "ERROR")
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      try SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      finally Verify.releaseQueryState(spark)
    }
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${Verify.jsonEscape(k)}: ${Verify.jsonEscape(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
