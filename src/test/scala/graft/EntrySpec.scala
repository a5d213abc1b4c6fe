package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke mirror of the driver's t1 gate plus a non-emptiness check for
  * every declared query at sf0.001. The value-level t2 mirror is
  * tools/check_correctness.py (DuckDB is python-side only on this box).
  */
class EntrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name returns rows at sf0.001") {
      assert(SparkEntry.queries(name)(spark, sf).count() > 0)
    }
  }
}
