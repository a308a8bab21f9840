package graft
object ProbeHost {
  def main(args: Array[String]): Unit = {
    (1 to 3).foreach(_ => println(f"PROBE ${Bench.probeSec()}%.2f s"))
  }
}
