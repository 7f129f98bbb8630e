package graft

import org.apache.spark.sql.SparkSession

/** Local replica of the driver's t1 smoke check: `SparkEntry.entry` on a
  * plain session (no special confs — the driver sets none) must return >0
  * rows at sf0.001.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      // DELIBERATELY no corpus reader confs here (unlike every other
      // entry point): this replicates the driver's conf-less session, so
      // it must keep exercising Tables.readerConfs' lazy re-apply path
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n " + (if (n > 0) "OK" else "EMPTY"))
    // gate size, derived from the source of truth — precommit.sh compares
    // this against the count SURVEY.md/BASELINE.md claim, so the docs can
    // never drift from the artifact again (round-11 verdict item 4: prose
    // froze at 178 while the gate shipped 179)
    println(s"[smoke] gate_queries=${SparkEntry.queries.size}")
    spark.stop()
    if (n == 0) sys.exit(1)
  }
}
