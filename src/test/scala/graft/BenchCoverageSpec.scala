package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical gate for the committed self-bench: `BENCH_SELF.json` must
  * time EXACTLY the declared query set. Three rounds (r11–r13) shipped a
  * stale self-bench where late-round queries went untimed — and the
  * untimed set hid the suite's worst outlier (q_kcore, 21.85 s). Advice
  * didn't fix the habit; a red test does. After adding or removing a
  * query, re-run `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch
  * "runMain graft.Bench"` and commit the refreshed json.
  */
class BenchCoverageSpec extends AnyFunSuite {

  test("committed BENCH_SELF.json times exactly the declared query set") {
    val p = java.nio.file.Paths.get("BENCH_SELF.json")
    assert(java.nio.file.Files.exists(p), "BENCH_SELF.json missing at repo root")
    val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val qobj = txt.substring(txt.indexOf("\"queries\":{") + "\"queries\":{".length)
    val timed = """"(q[0-9a-z_]+)":""".r
      .findAllMatchIn(qobj).map(_.group(1)).toSet
    val declared = SparkEntry.queries.keySet
    assert((declared -- timed).isEmpty,
      s"declared but untimed (re-run graft.Bench): ${(declared -- timed).toSeq.sorted}")
    assert((timed -- declared).isEmpty,
      s"timed but no longer declared: ${(timed -- declared).toSeq.sorted}")
  }
}
