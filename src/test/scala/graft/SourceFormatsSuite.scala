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

  test("events ts schema evolution: nanos-long, timestamp[us] NTZ, and timestamp[us] UTC all normalize identically") {
    // The driver has regenerated events.parquet with a different physical ts
    // encoding once already (TIMESTAMP(NANOS) → timestamp[us], 2026-08-13),
    // which silently took down the whole events family. This test pins the
    // contract: the SAME logical instants, written under every encoding the
    // data has ever carried, must produce byte-identical query results
    // through Tables.normalizeEventsTs.
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.MessageTypeParser

    val baseMicros = 1704067200000000L // 2024-01-01T00:00:00Z
    def writeFixture(tsAnnotation: String, tsScale: Long): String = {
      val dir = Files.createTempDirectory("graft-events-enc")
      val schema = MessageTypeParser.parseMessageType(
        s"""message events {
           |  required int64 event_id;
           |  required int64 ts ($tsAnnotation);
           |  required int64 user_id;
           |  required binary event_type (STRING);
           |  required double value;
           |  required binary props (STRING);
           |}""".stripMargin)
      val conf = new org.apache.hadoop.conf.Configuration()
      GroupWriteSupport.setSchema(schema, conf)
      val writer = ExampleParquetWriter
        .builder(new HPath(s"$dir/events.parquet")).withConf(conf).build()
      val fac = new SimpleGroupFactory(schema)
      try (0 until 240).foreach { i =>
        val g = fac.newGroup()
        g.add("event_id", i.toLong)
        g.add("ts", (baseMicros + i * 37L * 60L * 1000000L) * tsScale)
        g.add("user_id", (i % 7).toLong)
        g.add("event_type", if (i % 3 == 0) "click" else "view")
        g.add("value", i * 1.5)
        g.add("props", s"""{"k":$i}""")
        writer.write(g)
      } finally writer.close()
      dir.toString
    }

    def hourly(dir: String): Set[Seq[Any]] =
      Tables.events(spark, dir)
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("v"))
        .collect().map(_.toSeq).toSet

    val nanos    = hourly(writeFixture("TIMESTAMP(NANOS,true)", 1000L))
    val microNtz = hourly(writeFixture("TIMESTAMP(MICROS,false)", 1L))
    val microUtc = hourly(writeFixture("TIMESTAMP(MICROS,true)", 1L))
    assert(nanos.nonEmpty)
    assert(nanos == microNtz, "NANOS-as-long vs timestamp[us] NTZ diverged")
    assert(nanos == microUtc, "NANOS-as-long vs timestamp[us] UTC diverged")
    // and the normalized type is always TimestampType, what every events
    // query downstream was written against
    Seq("TIMESTAMP(NANOS,true)" -> 1000L, "TIMESTAMP(MICROS,false)" -> 1L).foreach {
      case (ann, sc) =>
        val dt = Tables.events(spark, writeFixture(ann, sc)).schema("ts").dataType
        assert(dt == TimestampType, s"$ann normalized to $dt, not TimestampType")
    }
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
