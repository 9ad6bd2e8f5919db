package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table support: pre-shuffle tables once at write time so
  * every later equi-join / aggregation on the bucket key is co-located.
  *
  * At 100 TB this is the standing answer to the repeated fact-fact join
  * (orders⨝lineitem on orderkey): both sides bucketed by the join key
  * into the same bucket count → SortMergeJoin with ZERO Exchange on
  * either side (verified in BucketingSpec by plan inspection). The
  * shuffle is paid once, at ingestion, instead of per query.
  *
  * Uses the session catalog (`saveAsTable` — bucketing metadata lives in
  * the catalog, not the parquet files), so callers must have a writable
  * `spark.sql.warehouse.dir` — or pass `path` to create the table
  * EXTERNAL at an explicit location instead (the bucketing metadata
  * still lives in the catalog either way).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int,
      sortCol: Option[String] = None, mode: SaveMode = SaveMode.ErrorIfExists,
      path: Option[String] = None): Unit = {
    val w0 = df.write.mode(mode).format("parquet").bucketBy(buckets, bucketCol)
    val w1 = path.fold(w0)(p => w0.option("path", p))
    sortCol.fold(w1)(c => w1.sortBy(c)).saveAsTable(table)
  }
}
