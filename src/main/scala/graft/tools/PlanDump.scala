package graft.tools

/** Dev utility: print the formatted physical plan of named declared
  * queries (`runMain graft.tools.PlanDump <sfDir> <query>...`) — the
  * .explain("formatted") iteration loop the build discipline calls for. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("graft-plandump")
    val dir = args.head
    args.drop(1).foreach { q =>
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
