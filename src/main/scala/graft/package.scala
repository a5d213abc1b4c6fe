package object graft {
  /** A declared query: (session, scale-factor dir) => result DataFrame.
    * Every declared query obeys the determinism contract (SURVEY §2):
    * ends in ORDER BY with a unique tiebreak, rounds float aggregates,
    * spells NULLS FIRST/LAST explicitly, emits event timestamps as
    * epoch-microsecond BIGINTs.
    */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
