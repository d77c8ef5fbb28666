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

  /** Sidecar dumps for the scale-gate contracts: extra engine state
    * (converged centroids, cell assignments, …) written by Verify
    * under `outDir/_aux/<name>` so a [[ScaleCheck]] can anchor a
    * linear replay where the full oracle would be quadratic. Skipped
    * by the driver's per-query compare (underscore prefix). */
  def auxDumps: Map[String, (SparkSession, String) => DataFrame] = Map.empty

  /** Scale contracts per query key — the sf1 gate's fallback when the
    * full-corpus oracle is quadratic (ORATIME) or fixture-scale-only
    * (documented LSH recall). Generated against a live session + sfDir
    * because the right check can be scale-dependent (e21's assignment
    * is exhaustive argmax at k ≤ 64 but hierarchically routed above).
    * Evaluated by `scripts/localcheck.py --scale-contracts` ONLY after
    * the full compare fails; at sf0.01 every full oracle passes so
    * contracts never fire there. */
  def scaleContracts(spark: SparkSession, sfDir: String): Map[String, Seq[ScaleCheck]] =
    Map.empty
}

/** One named check of a scale contract. Both sides are DuckDB SQL over
  * the base tables plus path placeholders the harness substitutes:
  * `{q}` = the query's own dumped parquet dir, `{aux}` = the `_aux`
  * sidecar dir, `{qof:NAME}` = another query's dumped dir (cross-
  * artifact anchoring — only to queries whose OWN full oracle stays
  * green at scale).
  *
  * kinds:
  *  - `exact`: both sides' result sets must match (the same
  *    column-sorted, row-canonicalized compare as the full gate);
  *  - `recall`: spark side returns one row `(n_got, n_matched)`,
  *    oracle side one row `(n_exact)`; passes iff `n_matched == n_got`
  *    (everything emitted is TRUE — subset) and
  *    `n_matched >= bound · n_exact` (the documented recall floor).
  */
final case class ScaleCheck(name: String, kind: String, spark: String,
                            oracle: String, bound: Double = 0.0)

/** Helper for queries whose Spark side is the same (or nearly the
  * same) SQL text executed by our SQL gate. */
final case class SqlQ(name: String, sparkSql: String, oracleSql: Option[String])

object SqlQ {
  /** Same text runs on both engines. */
  def shared(name: String, sql: String): SqlQ = SqlQ(name, sql, Some(sql))
  def split(name: String, sparkSql: String, oracleSql: String): SqlQ =
    SqlQ(name, sparkSql, Some(oracleSql))
}
