package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cost-based-optimizer witness: the statistics [[graft.relational
  * .RelationalQueries.ordersProfile]] computes are exactly what Catalyst's
  * CBO wants — this suite closes the loop by actually FEEDING stats to the
  * catalog (ANALYZE TABLE … FOR COLUMNS) and pinning that they change a
  * 3-way join's order. At 100 TB join order is the difference between
  * hours and minutes; the engine must be able to hand Catalyst the
  * evidence, not just print it.
  *
  * The fixture writes managed copies of three testdata tables into the
  * (gitignored) test warehouse, analyzes them, and builds the q9-shaped
  * join `(lineitem ⋈ supplier) ⋈ σ_brand(part)` in a deliberately bad
  * syntactic order: the selective part filter is LAST, so the unreordered
  * plan joins the full fact table to every supplier before the 1/25-brand
  * prune. With CBO + joinReorder + the column histograms, Catalyst must
  * move the selective part join off the tail — and the result must be
  * byte-identical either way. */
class CboSuite extends SparkSpec {

  private val db = "graft_cbo"

  private def leafOrder(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().map(_.toString)
      .map { s =>
        Seq("lineitem_t", "supplier_t", "part_t").find(s.contains).getOrElse("?")
      }

  private def q9Shape(): DataFrame =
    spark.table(s"$db.lineitem_t")
      .join(spark.table(s"$db.supplier_t"), col("l_suppkey") === col("s_suppkey"))
      .join(spark.table(s"$db.part_t").filter(col("p_brand") === "Brand#11"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("bigint").as("qty"))

  test("ANALYZE-fed column stats reorder a 3-way join under CBO, result unchanged") {
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      // force every join strategy decision through stats, not hints
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      for (t <- Seq("lineitem", "supplier", "part")) {
        Tables.table(spark, Sf0001, t).write.mode("overwrite")
          .saveAsTable(s"$db.${t}_t")
      }
      spark.sql(s"ANALYZE TABLE $db.lineitem_t COMPUTE STATISTICS FOR COLUMNS l_suppkey, l_partkey, l_quantity")
      spark.sql(s"ANALYZE TABLE $db.supplier_t COMPUTE STATISTICS FOR COLUMNS s_suppkey, s_nationkey")
      spark.sql(s"ANALYZE TABLE $db.part_t COMPUTE STATISTICS FOR COLUMNS p_partkey, p_brand")

      val plainOrder = leafOrder(q9Shape()) // CBO off: syntactic order
      val plainRows = q9Shape().collect().map(_.toSeq.mkString("|")).sorted

      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // stats reached the optimizer: the analyzed row count is visible on
      // the relation's plan, not just in the catalog
      val rc = spark.table(s"$db.part_t").queryExecution.optimizedPlan.stats.rowCount
      assert(rc.isDefined && rc.get.toLong ==
        Tables.table(spark, Sf0001, "part").count(),
        s"ANALYZE row count did not reach the optimizer: $rc")
      val cboOrder = leafOrder(q9Shape())
      val cboRows = q9Shape().collect().map(_.toSeq.mkString("|")).sorted

      assert(plainOrder == Seq("lineitem_t", "supplier_t", "part_t"),
        s"fixture lost its point — syntactic order already optimal: $plainOrder")
      assert(cboOrder != plainOrder,
        s"CBO did not reorder the join despite column stats: $cboOrder")
      // the selective part join must leave the tail position
      assert(cboOrder.last != "part_t",
        s"selective side still joins last under CBO: $cboOrder")
      assert(cboRows.toSeq == plainRows.toSeq,
        "join reorder changed the result")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("managed-catalog mode: a REGISTRY query reorders under CBO, result identical") {
    // The fixture test above proves the ANALYZE→reorder mechanism on
    // managed copies; this one proves the REGISTERED query path: in
    // managed-catalog mode (Tables.materializeCatalog + cbo on) the
    // loaders resolve ANALYZEd catalog tables, the size-gate hints stand
    // down (Plans.statsTrusted — hints exclude joins from
    // CostBasedJoinReorder), and q5's dimension chain must re-sequence
    // while producing byte-identical rows.
    def leafCols(df: DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collectLeaves()
        .map(_.output.headOption.map(_.name).getOrElse("?"))
    def q5() = graft.relational.RelationalQueries.q5NationRevenue(spark, Sf0001)
    val rawOrder = leafCols(q5())
    val rawRows = q5().collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val cboConfs = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = cboConfs.map(k => k -> spark.conf.getOption(k))
    try {
      Tables.materializeCatalog(spark, Sf0001, "graft_cbo_reg")
      cboConfs.foreach(spark.conf.set(_, "true"))
      assert(graft.Plans.statsTrusted(spark), "managed mode did not arm statsTrusted")
      val cboOrder = leafCols(q5())
      assert(cboOrder != rawOrder,
        s"registry q5 did not reorder under managed-catalog CBO: $cboOrder")
      val cboRows = q5().collect().map(_.toSeq.mkString("|")).sorted.toSeq
      assert(cboRows == rawRows, "managed-catalog q5 changed the result")
    } finally {
      spark.conf.unset(Tables.ManagedDbKey)
      spark.conf.unset(Tables.ManagedDirKey)
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      spark.sql("DROP DATABASE IF EXISTS graft_cbo_reg CASCADE")
    }
  }

  test("managed-catalog mode: q3 and q7 registry chains also reorder, results identical") {
    // Widens the single-query witness above to the other registry shapes
    // that re-sequence at this scale (CboBench at sf0.001: q3, q5, q7
    // REORDERED, 0 fingerprint mismatches across all 34 multi-join
    // probes): q3's customer⋈orders⋈lineitem chain and q7's
    // nation⋈nation⋈supplier⋈lineitem⋈orders⋈customer volume join.
    def leafCols(df: DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collectLeaves()
        .map(_.output.headOption.map(_.name).getOrElse("?"))
    val qs: Seq[(String, () => DataFrame)] = Seq(
      "q3" -> (() => graft.relational.RelationalQueries.q3Shipping(spark, Sf0001)),
      "q7" -> (() => graft.relational.RelationalQueries.q7NationVolume(spark, Sf0001)))
    val rawSide = qs.map { case (n, q) =>
      (n, leafCols(q()), q().collect().map(_.toSeq.mkString("|")).sorted.toSeq)
    }
    val cboConfs = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = cboConfs.map(k => k -> spark.conf.getOption(k))
    try {
      Tables.materializeCatalog(spark, Sf0001, "graft_cbo_reg2")
      cboConfs.foreach(spark.conf.set(_, "true"))
      qs.zip(rawSide).foreach { case ((n, q), (_, rawOrder, rawRows)) =>
        val cboOrder = leafCols(q())
        assert(cboOrder != rawOrder,
          s"registry $n did not reorder under managed-catalog CBO: $cboOrder")
        val cboRows = q().collect().map(_.toSeq.mkString("|")).sorted.toSeq
        assert(cboRows == rawRows, s"managed-catalog $n changed the result")
      }
    } finally {
      spark.conf.unset(Tables.ManagedDbKey)
      spark.conf.unset(Tables.ManagedDirKey)
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      spark.sql("DROP DATABASE IF EXISTS graft_cbo_reg2 CASCADE")
    }
  }

  test("CBO pulls the selective dimension out of a 5-way star's tail") {
    // A snowflake chain in the WORST syntactic order: the fact table
    // joins its biggest dimensions first and the 1/5-selective region
    // filter sits at the very end. With ANALYZE stats + joinReorder the
    // optimizer must move the selective branch off the tail — the
    // decision that separates hours from minutes on a 100 TB fact table.
    val db2 = "graft_cbo_star"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db2")
    def leafOrder5(df: DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collectLeaves().map(_.toString)
        .map { s =>
          Seq("lineitem_t", "orders_t", "supplier_t", "nation_t", "region_t")
            .find(s.contains).getOrElse("?")
        }
    def star(): DataFrame =
      spark.table(s"$db2.lineitem_t")
        .join(spark.table(s"$db2.orders_t"), col("l_orderkey") === col("o_orderkey"))
        .join(spark.table(s"$db2.supplier_t"), col("l_suppkey") === col("s_suppkey"))
        .join(spark.table(s"$db2.nation_t"), col("s_nationkey") === col("n_nationkey"))
        .join(spark.table(s"$db2.region_t").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("bigint").as("qty"))
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      for (t <- Seq("lineitem", "orders", "supplier", "nation", "region"))
        Tables.table(spark, Sf0001, t).write.mode("overwrite").saveAsTable(s"$db2.${t}_t")
      spark.sql(s"ANALYZE TABLE $db2.lineitem_t COMPUTE STATISTICS FOR COLUMNS l_orderkey, l_suppkey, l_quantity")
      spark.sql(s"ANALYZE TABLE $db2.orders_t COMPUTE STATISTICS FOR COLUMNS o_orderkey")
      spark.sql(s"ANALYZE TABLE $db2.supplier_t COMPUTE STATISTICS FOR COLUMNS s_suppkey, s_nationkey")
      spark.sql(s"ANALYZE TABLE $db2.nation_t COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_regionkey, n_name")
      spark.sql(s"ANALYZE TABLE $db2.region_t COMPUTE STATISTICS FOR COLUMNS r_regionkey, r_name")
      val plainOrder = leafOrder5(star())
      val plainRows = star().collect().map(_.toSeq.mkString("|")).sorted.toSeq
      assert(plainOrder.last == "region_t",
        s"fixture lost its point — selective region not syntactically last: $plainOrder")
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val cboOrder = leafOrder5(star())
      assert(cboOrder != plainOrder,
        s"CBO did not reorder the 5-way star despite stats: $cboOrder")
      assert(cboOrder.last != "region_t",
        s"selective region still joins last under CBO: $cboOrder")
      val cboRows = star().collect().map(_.toSeq.mkString("|")).sorted.toSeq
      assert(cboRows == plainRows, "star reorder changed the result")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      spark.sql(s"DROP DATABASE IF EXISTS $db2 CASCADE")
    }
  }
}
