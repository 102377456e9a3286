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

  test("dynamic partition pruning: a runtime dim filter prunes fact partitions at execution") {
    // The at-scale join shape: a fact table partitioned on the join key,
    // joined to a dimension whose filter is only known at plan time on a
    // NON-key column — static pruning can't help, DPP inserts a runtime
    // subquery into the fact scan's partition filters.
    val out = Files.createTempDirectory("graft-dpp").toString
    Tables.lineitem(spark, Sf0001)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    val fact = spark.read.parquet(out)
    import spark.implicits._
    // the dim must be a FILE relation: a local Seq would have its filter
    // constant-folded away (ConvertToLocalRelation), and DPP's heuristic
    // requires a surviving selective predicate on the build side
    val dimPath = Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("R", "returned"), ("A", "accepted"), ("N", "none"))
      .toDF("l_returnflag", "status_desc")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact
      .join(dim.filter(col("status_desc") === "returned"), "l_returnflag")
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic-pruning subquery in the fact scan:\n$plan")
    val rows = joined.collect()
    assert(rows.length == 1 && rows.head.getString(0) == "R")
    assert(rows.head.getLong(1) ==
      Tables.lineitem(spark, Sf0001).filter(col("l_returnflag") === "R").count())
  }

  test("range-partitioned sorted export: files carry disjoint ordered key ranges (terasort shape)") {
    // Global total-order output without a single-partition sort: range
    // exchange + per-partition sort, then per-file min/max must tile the
    // key space — the property that lets a reader binary-search files.
    val out = Files.createTempDirectory("graft-sorted").toString
    val nParts = 4
    Tables.documents(spark, Sf0001)
      .repartitionByRange(nParts, col("n_chars"), col("doc_id"))
      .sortWithinPartitions(col("n_chars"), col("doc_id"))
      .write.mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length == nParts)
    val ranges = files.toSeq.map { f =>
      val rows = spark.read.parquet(f.getAbsolutePath)
        .select(col("n_chars"), col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == rows.sorted, s"${f.getName} not sorted within file")
      (rows.head, rows.last)
    }.sortBy(_._1)
    ranges.zip(ranges.tail).foreach { case ((_, max1), (min2, _)) =>
      assert(implicitly[Ordering[(Long, Long)]].lt(max1, min2),
        "file key ranges must be disjoint and ordered")
    }
    // nothing lost in the exchange
    assert(spark.read.parquet(out).count() == Tables.documents(spark, Sf0001).count())
  }

  test("z-order layout skips more files than key-order for a 2-D box predicate") {
    import graft.relational.RelationalQueries
    // sf0.01 (2000 parts): enough rows per file that layout, not chance,
    // decides which files a box predicate touches
    val nFiles = 8
    val z = RelationalQueries.partWithZval(spark, "/root/testdata/sf0.01")
    def writeBy(label: String, key: org.apache.spark.sql.Column): String = {
      val out = Files.createTempDirectory(s"graft-z-$label").toString
      z.withColumn("_k", key)
        .repartitionByRange(nFiles, col("_k"))
        .sortWithinPartitions(col("_k"))
        .drop("_k")
        .write.mode("overwrite").parquet(out)
      out
    }
    // per-file min/max stats → how many files could a reader skip for a box
    // predicate on BOTH dimensions (the parquet row-group pruning model)?
    def filesOverlapping(dir: String, szLo: Long, szHi: Long, pbLo: Long, pbHi: Long): Int =
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .count { f =>
          val s = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col("sz")), max(col("sz")), min(col("pb")), max(col("pb")))
            .head()
          s.getLong(0) <= szHi && s.getLong(1) >= szLo &&
            s.getLong(2) <= pbHi && s.getLong(3) >= pbLo
        }
    // the unclustered baseline orders by a HASH of the key: TPC-H derives
    // p_retailprice from p_partkey, so raw key order is itself partially
    // clustered on the price dimension and would understate the win
    val (zDir, kDir) = (writeBy("zval", col("zval")), writeBy("rand", md5(col("p_partkey").cast("string"))))
    // a selective box: one quarter of each dimension
    val stats = z.agg(min(col("sz")), max(col("sz")), min(col("pb")), max(col("pb"))).head()
    val (szLo, szHi) = (stats.getLong(0), stats.getLong(0) + (stats.getLong(1) - stats.getLong(0)) / 4)
    val (pbLo, pbHi) = (stats.getLong(2), stats.getLong(2) + (stats.getLong(3) - stats.getLong(2)) / 4)
    val zTouch = filesOverlapping(zDir, szLo, szHi, pbLo, pbHi)
    val kTouch = filesOverlapping(kDir, szLo, szHi, pbLo, pbHi)
    // the hash layout spreads the box over every file; z-order must
    // confine it to at most half
    assert(kTouch == nFiles, s"hash-ordered layout unexpectedly skippable ($kTouch/$nFiles)")
    assert(zTouch * 2 <= nFiles, s"z-order should touch <= half the files, touched $zTouch/$nFiles")
    // both layouts return identical rows for the box
    def rowsIn(dir: String) = spark.read.parquet(dir)
      .filter(col("sz").between(szLo, szHi) && col("pb").between(pbLo, pbHi))
      .select(col("p_partkey")).collect().map(_.getLong(0)).sorted.toSeq
    assert(rowsIn(zDir) == rowsIn(kDir) && rowsIn(zDir).nonEmpty)
  }
}
