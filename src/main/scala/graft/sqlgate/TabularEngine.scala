package graft.sqlgate

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Executes user-dialect SQL against the lake: the reference's
  * `_query_table` path (`app/routes/datasets/queries.py:506-525`),
  * except the scrutinized SQL runs on Catalyst instead of being pushed
  * to PostgreSQL — the "API→PG" process boundary becomes
  * "driver→executors" (SURVEY §3.1).
  */
object TabularEngine {

  /** Scrutinize `sql` (whose FROM may name anything, conventionally
    * `data`) and execute it against lake table `table`. */
  def userQuery(spark: SparkSession, sfDir: String, table: String,
                sql: String, geometryGeoJson: Option[String] = None): DataFrame = {
    Tables.register(spark, sfDir)
    val rewritten = Scrutinizer.scrutinizeTo(table, geometryGeoJson, sql)
    spark.sql(rewritten)
  }
}
