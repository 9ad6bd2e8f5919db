package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format surface beyond the fixtures' parquet: CSV, JSON
  * lines, TSV text (the reference's output format), and partitioned
  * parquet.
  *
  * Defaults chosen for lossless round-trips (headers + explicit schema
  * on read — schema inference is both slow at scale, it is an extra full
  * pass, and lossy for types).
  */
object Formats {

  def writeCsv(df: DataFrame, path: String, mode: SaveMode = SaveMode.ErrorIfExists): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJsonl(df: DataFrame, path: String, mode: SaveMode = SaveMode.ErrorIfExists): Unit =
    df.write.mode(mode).json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Partitioned parquet: the lake layout. Partition columns become
    * directories; readers filtering on them get partition PRUNING (no
    * file even opened) — at 100 TB this is the first and cheapest
    * exclusion lever, before row-group stats and pushed filters.
    */
  def writePartitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.ErrorIfExists): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC: the other columnar lake format (predicate pushdown + column
    * pruning work the same way as parquet — Spark's ORC reader consumes
    * file/stripe min/max exactly like row-group stats). Same
    * ErrorIfExists default as every sink here.
    */
  def writeOrc(df: DataFrame, path: String, mode: SaveMode = SaveMode.ErrorIfExists): Unit =
    df.write.mode(mode).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
