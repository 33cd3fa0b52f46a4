package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables: the shuffle-elimination path for
  * repeated large-large joins (SURVEY.md §2.3 / SCALING.md "Joins").
  *
  * Writing both join sides bucketed by the join key into the session
  * catalog lets Catalyst plan the join with NO exchange on either side —
  * at 100 TB that removes the dominant cost of every recurring fact-fact
  * join (the reference's workload re-profiles the same tables each run,
  * so co-location pays for itself after one write).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (overwriting; clears any
    * orphaned location left by an interrupted previous write). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath + "/" + table)
    if (loc.exists) Fs.deleteRec(loc)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — plans without a
    * shuffle when bucket counts match. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
