package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Tables

/** Columnar sink capabilities: hive-style partitioned parquet writes and
  * the partition pruning they buy on re-read — the layout that replaces the
  * reference's flat mr-out-Y files for 100 TB outputs. */
class SinkSuite extends SparkSpec {

  test("partitioned parquet roundtrip + partition pruning in the re-read plan") {
    val out = Files.createTempDirectory("graft-part").toString
    Tables.lineitem(spark, Sf0001)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)

    val back = spark.read.parquet(out)
    assert(back.count() == Tables.lineitem(spark, Sf0001).count())

    val pruned = back.filter(col("l_returnflag") === "R")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("l_returnflag"),
      s"expected partition pruning in:\n$plan")
    // only the R partition directory is read
    val expected = Tables.lineitem(spark, Sf0001).filter(col("l_returnflag") === "R").count()
    assert(pruned.count() == expected)
  }

  test("maxRecordsPerFile bounds output file size (the small-files/fat-files control)") {
    val out = Files.createTempDirectory("graft-maxrec").toString
    val n = Tables.lineitem(spark, Sf0001).count()
    Tables.lineitem(spark, Sf0001)
      .coalesce(1) // one task; file splitting must come from the option, not parallelism
      .write.mode("overwrite").option("maxRecordsPerFile", 1000).parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length == Math.ceil(n / 1000.0).toInt,
      s"expected ceil($n/1000) files, got ${files.length}")
    assert(spark.read.parquet(out).count() == n)
  }

  test("schema evolution: mergeSchema unions columns across file generations") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$out/g=1")
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2").write.parquet(s"$out/g=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.sorted.toSeq == Seq("g", "id", "v1", "v2"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("v2"))) // old generation → null
    assert(rows(1).getDouble(rows(1).fieldIndex("v2")) == 9.5)
  }

  test("sorted text sink partition count follows nReduce (mr-out-Y analog)") {
    val out = Files.createTempDirectory("graft-nred").toString
    import spark.implicits._
    val rows = Seq(("a", "1"), ("b", "2"), ("c", "3"), ("d", "4")).toDS()
    rows.repartition(3, col("_1"))
      .select(concat_ws(" ", col("_1"), col("_2")).as("value"))
      .write.mode("overwrite").text(out)
    val parts = new java.io.File(out).listFiles().count(_.getName.startsWith("part-"))
    assert(parts == 3)
    val merged = spark.read.text(out).collect().map(_.getString(0)).sorted.toSeq
    assert(merged == Seq("a 1", "b 2", "c 3", "d 4"))
  }
}
