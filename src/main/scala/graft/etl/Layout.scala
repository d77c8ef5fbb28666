package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout mapping for table writes (SURVEY §4): PostgreSQL's
  * storage controls translated to a Parquet lake —
  *
  *   - list/range table partitions (`create_partitions.sh`,
  *     `table_source_assets.py:288-338`) → `partitionBy(col)`
  *     directories, giving Catalyst static/dynamic partition pruning;
  *   - `CLUSTER` (physical sort, `cluster_table.sh`) →
  *     `sortWithinPartitions`, giving parquet min/max row-group stats
  *     their selectivity;
  *   - btree indexes (`creation_options.py:48-56`) → fold into the
  *     sort order (secondary indexes don't exist in Spark; ordered
  *     row groups + stats are the equivalent);
  *   - gist (spatial) indexes → persisted bbox columns
  *     (`<col>_xmin…`) so spatial predicates prune on column stats.
  */
object Layout {

  final case class IndexSpec(indexType: String, columns: Seq[String])

  def write(df: DataFrame, path: String,
            partitionColumns: Seq[String] = Nil,
            clusterColumns: Seq[String] = Nil,
            indexes: Seq[IndexSpec] = Nil): Unit = {
    var out = df
    // gist(geom) → bbox companion columns
    indexes.filter(_.indexType == "gist").flatMap(_.columns).distinct.foreach { g =>
      out = out
        .withColumn(s"${g}_xmin", expr(s"st_envelope($g).xmin"))
        .withColumn(s"${g}_ymin", expr(s"st_envelope($g).ymin"))
        .withColumn(s"${g}_xmax", expr(s"st_envelope($g).xmax"))
        .withColumn(s"${g}_ymax", expr(s"st_envelope($g).ymax"))
    }
    val sortCols = (clusterColumns ++
      indexes.filter(_.indexType == "btree").flatMap(_.columns)).distinct
    var writer = out
    if (sortCols.nonEmpty) {
      // lead with the partition columns: FileFormatWriter requires its
      // output sorted by them and would otherwise inject its own
      // (non-stable) sort, destroying the cluster order.
      // With NO partition columns, hash-repartition() would degenerate
      // to a round-robin scatter (every file spans the full key range,
      // killing row-group min/max selectivity) — range-partition on
      // the cluster keys instead so files hold disjoint key ranges.
      val parted =
        if (partitionColumns.nonEmpty) out.repartition(partitionColumns.map(col): _*)
        else out.repartitionByRange(sortCols.map(col): _*)
      writer = parted
        .sortWithinPartitions((partitionColumns ++ sortCols).distinct.map(col): _*)
    }
    val w = writer.write.mode("overwrite")
    (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w)
      .parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
