package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.sources.Formats

/** Source/sink round-trips: CSV, JSON lines, partitioned parquet with
  * partition pruning.
  */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def tmp(name: String): String =
    Files.createTempDirectory(name).resolve("data").toString

  test("CSV round-trip preserves rows and values") {
    val nation = Tables.nation(spark, sf)
    val path = tmp("csv_rt")
    Formats.writeCsv(nation, path)
    val back = Formats.readCsv(spark, path, nation.schema)
    assert(back.count() == nation.count())
    assert(back.exceptAll(nation).count() == 0 && nation.exceptAll(back).count() == 0)
  }

  test("JSONL round-trip preserves rows and values") {
    val cust = Tables.customer(spark, sf)
    val path = tmp("json_rt")
    Formats.writeJsonl(cust, path)
    val back = Formats.readJsonl(spark, path, cust.schema)
    assert(back.exceptAll(cust).count() == 0 && cust.exceptAll(back).count() == 0)
  }

  test("ORC round-trip preserves rows and values, pushes filters to the scan") {
    val docs = Tables.documents(spark, sf)
    val path = tmp("orc_rt")
    Formats.writeOrc(docs, path)
    val back = Formats.readOrc(spark, path)
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
    // predicate pushdown reaches the ORC scan like parquet
    val plan = Formats.readOrc(spark, path).filter(col("doc_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []"),
      s"ORC scan must receive pushed filters:\n$plan")
  }

  test("partitioned parquet: lang filter prunes to one partition directory") {
    val docs = Tables.documents(spark, sf)
    val path = tmp("part_pq")
    Formats.writePartitionedParquet(docs, path, Seq("lang"))
    val back = Formats.readParquet(spark, path).filter(col("lang") === "en")
    assert(back.count() == docs.filter(col("lang") === "en").count())
    // pruning evidence: the scan's selected partitions cover only lang=en
    val scanStr = back.queryExecution.executedPlan.toString
    assert(scanStr.contains("PartitionFilters"))
  }

  test("malformed records: PERMISSIVE quarantines, DROPMALFORMED drops, FAILFAST throws") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("dirty_json").toString
    // three clean rows, one type-broken, one truncated JSON
    Files.writeString(java.nio.file.Paths.get(s"$dir/part.jsonl"),
      """{"id": 1, "v": 10.0}
        |{"id": 2, "v": 20.0}
        |{"id": "not-a-number", "v": 30.0}
        |{"id": 4, "v":
        |{"id": 5, "v": 50.0}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("_corrupt_record", StringType)))
    // PERMISSIVE (the 100 TB default): dirty rows land in the corrupt
    // column instead of killing the job; clean rows parse fully
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    try {
      assert(permissive.count() == 5)
      assert(permissive.filter(col("_corrupt_record").isNotNull).count() == 2)
      assert(permissive.filter(col("_corrupt_record").isNull)
        .agg(sum("v")).head().getDouble(0) == 80.0)
    } finally permissive.unpersist()
    // DROPMALFORMED's "malformed" is judged against the REQUIRED schema
    // after column pruning — a production trap worth pinning: count()
    // requires no columns, so only the syntactically-broken row drops
    // (4 survive); materializing the typed columns also makes the
    // type-mismatched row malformed (3 survive). Row counts under
    // DROPMALFORMED are not a fixed property of the file.
    val dropped = spark.read
      .schema(StructType(schema.dropRight(1)))
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.count() == 4)
    assert(dropped.select("id", "v").collect().length == 3)
    // FAILFAST: ingestion is the error barrier
    intercept[org.apache.spark.SparkException] {
      spark.read.schema(StructType(schema.dropRight(1)))
        .option("mode", "FAILFAST").json(dir).collect()
    }
  }

  test("sink honors ErrorIfExists (reference fail-if-output-exists contract)") {
    val path = tmp("csv_exists")
    Formats.writeCsv(Tables.region(spark, sf), path)
    intercept[Exception] {
      Formats.writeCsv(Tables.region(spark, sf), path, SaveMode.ErrorIfExists)
    }
  }
}
