package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One module of the engine's query surface. `SparkEntry` unions all
  * modules into the driver contract.
  *
  * Conventions for DuckDB-oracle parity (the driver hash-compares
  * values after sorting columns by name):
  *   - alias every computed column identically in Spark and oracle SQL;
  *   - aggregate doubles through exact `decimal` casts (testdata doubles
  *     are 2-decimal-valued) so sums are order-independent, then cast
  *     back to double so output schemas agree;
  *   - per-row double arithmetic is IEEE-identical in both engines and
  *     needs no rounding;
  *   - prefer `cast(ts as date)` over raw timestamps in projections.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB-runnable ANSI SQL oracle per query key; omit a key for
    * ops whose semantics aren't SQL-expressible (driver then records a
    * weaker rows-only check). */
  def oracles: Map[String, String]
}

/** Helper for queries whose Spark side is the same (or nearly the
  * same) SQL text executed by our SQL gate. */
final case class SqlQ(name: String, sparkSql: String, oracleSql: Option[String])

object SqlQ {
  /** Same text runs on both engines. */
  def shared(name: String, sql: String): SqlQ = SqlQ(name, sql, Some(sql))
  def split(name: String, sparkSql: String, oracleSql: String): SqlQ =
    SqlQ(name, sparkSql, Some(oracleSql))
}
