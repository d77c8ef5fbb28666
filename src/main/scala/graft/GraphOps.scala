package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation with
  * pointer jumping — THE shared kernel behind d7's duplicate-cluster
  * resolution and m21's frame-cluster labeling (one fixed-point
  * definition, two operators; the result is algorithm-independent:
  * each node's label is the minimum node id in its component).
  *
  * Scale shape: every round is a fixed number of joins/aggregations
  * over the edge and label tables (never anything driver-side that
  * scales with the data — only the convergence counter crosses to
  * the driver), and the pointer-jump pass (`lbl := lbl(lbl)`)
  * doubles label reach per round, so chain-shaped components
  * converge in O(log diameter) rounds instead of O(diameter).
  * Iterates are eagerly `localCheckpoint`ed: `persist` alone keeps
  * the full logical plan, and a loop referencing its own output
  * twice doubles the plan tree per round — Catalyst analysis time
  * explodes long before the data does (measured in round 4; what
  * GraphX does for Pregel loops).
  */
object GraphOps {

  /** Eager localCheckpoint + STATISTICS truncation. `localCheckpoint`
    * cuts the logical plan but INHERITS the pre-checkpoint plan's
    * Catalyst statistics into the resulting LogicalRDD, and a
    * fixed-point loop COMPOUNDS them: every round's join-size
    * estimate is a product over its children, so the inherited
    * sizeInBytes grows double-exponentially in round count — around
    * round 10 the BigInt has millions of digits and the DRIVER spends
    * minutes per plan inside BigInteger.multiplyToomCook3 (measured:
    * m21's hash graph pinned the main thread there; d7's 2–4-round
    * doc graphs never ran long enough to fall off the cliff).
    * Rebasing the Dataset on the checkpointed RDD resets statistics
    * to the RDD's own materialized size. The Row round-trip is
    * label-table-sized (two integral columns), paid once per round. */
  private def ckptFresh(spark: org.apache.spark.sql.SparkSession,
                        df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    spark.createDataFrame(ck.rdd, ck.schema)
  }

  /** Min-label connected components.
    *
    * @param edges SYMMETRIC edge list (both directions present),
    *              columns `a`, `b` (same integral type as `nodes.id`)
    * @param nodes one column `id`; isolated nodes keep their own id
    *              as label
    * @return columns `id`, `lbl` (min id in the component)
    */
  def ccMinLabel(spark: org.apache.spark.sql.SparkSession,
                 edges0: DataFrame, nodes: DataFrame): DataFrame = {
    val edges = ckptFresh(spark, edges0.select(col("a"), col("b")))
    var labels = ckptFresh(spark, nodes.selectExpr("id", "id AS lbl"))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      rounds += 1
      // neighbor-min pass: every node takes the min label on its edges
      val prop = edges.join(labels, col("a") === col("id"))
        .groupBy(col("b")).agg(min(col("lbl")).as("nlbl"))
      val stepped = labels.join(prop, col("id") === col("b"), "left")
        .selectExpr("id", "least(lbl, coalesce(nlbl, lbl)) AS lbl")
      // pointer-jump pass (lbl := lbl(lbl)): labels always point at a
      // node of the same component with a <= id, so composing the
      // pointer doubles the reach
      val parents = stepped.selectExpr("id AS p_id", "lbl AS p_lbl")
      val next = ckptFresh(spark,
        stepped.join(parents, col("lbl") === col("p_id"), "left")
          .selectExpr("id", "coalesce(p_lbl, lbl) AS lbl"))
      changed = next.as("n").join(labels.as("o"), "id")
        .where(col("n.lbl") =!= col("o.lbl")).count()
      labels = next
    }
    require(changed == 0, s"label propagation did not converge in $rounds rounds")
    labels
  }
}
