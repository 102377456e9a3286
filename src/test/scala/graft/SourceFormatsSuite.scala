package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Source/format coverage beyond parquet + wholetext: JSON-lines and CSV
  * round-trips with explicit schemas, and byte-based input splitting (the
  * strictly-better replacement for the reference's file-count chunking,
  * SURVEY.md §2.1 F16). */
class SourceFormatsSuite extends SparkSpec {

  private lazy val docs = Tables.documents(spark, Sf0001).select("doc_id", "lang", "n_chars")

  test("JSON-lines sink/source round-trip preserves rows") {
    val out = Files.createTempDirectory("graft-json").toString
    docs.write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val back = spark.read.schema(schema).json(out)
    assert(back.count() == 500)
    assert(back.agg(sum("n_chars")).collect()(0).getLong(0) ==
      docs.agg(sum("n_chars")).collect()(0).getLong(0))
  }

  test("CSV sink/source round-trip with header and explicit schema") {
    val out = Files.createTempDirectory("graft-csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .schema("doc_id LONG, lang STRING, n_chars LONG").csv(out)
    assert(back.count() == 500)
    assert(back.select("lang").distinct().count() == docs.select("lang").distinct().count())
  }

  test("ORC sink/source round-trip with predicate pushdown") {
    val out = Files.createTempDirectory("graft-orc").toString
    Tables.lineitem(spark, Sf0001).write.mode("overwrite").orc(out)
    val back = spark.read.orc(out).filter(col("l_quantity") > 25.0)
    val expected = Tables.lineitem(spark, Sf0001).filter(col("l_quantity") > 25.0).count()
    assert(back.count() == expected)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"))
  }

  test("corrupt JSON records are captured, not fatal (PERMISSIVE + _corrupt_record)") {
    // a 100 TB ingest WILL contain malformed rows; the engine must keep
    // them inspectable instead of failing the job or silently dropping them
    val dir = Files.createTempDirectory("graft-corrupt")
    Files.writeString(dir.resolve("data.json"),
      """{"id": 1, "v": "ok"}
        |not json at all
        |{"id": 3, "v": "also ok"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
      .cache() // corrupt-record column must not be queried alone on the lazy frame
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("id").isNotNull).count() == 2)
    df.unpersist()
  }

  test("byte-based input splitting: smaller maxPartitionBytes yields more scan partitions") {
    val before = Tables.lineitem(spark, Sf0001).rdd.getNumPartitions
    val old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "32768")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val after = Tables.lineitem(spark, Sf0001).rdd.getNumPartitions
      assert(after > before, s"expected more partitions: before=$before after=$after")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", old)
      spark.conf.unset("spark.sql.files.openCostInBytes")
    }
  }
}
