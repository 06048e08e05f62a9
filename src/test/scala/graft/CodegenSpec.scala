package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-stage-codegen guard for the ENTIRE declared query surface.
  *
  * Spark silently falls back to interpreted execution when a generated
  * method exceeds the JVM's 64 KB limit (`ERROR CodeGenerator: ... Code ...
  * grows beyond 64 KB` in the log, query still succeeds) — correctness
  * survives but the hot path quietly loses an order of magnitude, which at
  * 100 TB is the difference between a plan that works and one that
  * doesn't. This suite executes every declared query once at the smoke SF
  * with `spark.sql.codegen.fallback=false`, so a codegen compile failure
  * in ANY declared query fails the build instead of shipping as a silent
  * slowdown. (The one historical instance was a test-harness aggregate —
  * OperatorSpec's Morton bijectivity sweep — restructured alongside this
  * guard.)
  */
class CodegenSpec extends AnyFunSuite with SparkFixture {

  test("every declared query executes with codegen fallback disabled") {
    val old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            failures += s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(300)}"
        }
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", old)
    assert(failures.isEmpty,
      s"${failures.size} queries failed under codegen.fallback=false:\n" +
        failures.mkString("\n"))
  }
}
