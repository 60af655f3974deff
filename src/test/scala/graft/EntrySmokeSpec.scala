package graft

/** Smoke: every driver-contract query runs and returns a sane row count on
  * the smallest driver-generated scale factor (the same entry points Verify
  * dumps for the DuckDB oracle at sf0.01).
  */
class EntrySmokeSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"
  private def available = new java.io.File(s"$sfDir/lineitem.parquet").exists()

  test("entry flagship returns rows") {
    assume(available, s"$sfDir not present")
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every queries entry executes with rows > 0 at sf0.001") {
    assume(available, s"$sfDir not present")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val r = try {
        val n = fn(spark, sfDir).count()
        if (n > 0) None else Some(s"$name: 0 rows")
      } catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}") }
      spark.catalog.clearCache() // queries may leave persisted frames behind
      r
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without queries: $extra")
  }
}
