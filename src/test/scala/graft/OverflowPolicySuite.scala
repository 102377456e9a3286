package graft

import org.apache.spark.sql.functions._

/** The module-wide int64-ceiling policy, enforced instead of documented:
  * every site whose scaladoc used to say "past n ≈ …, lower to
  * DECIMAL(38,0)" now ships the lowering, and this suite drives each
  * lowered expression with fixtures ABOVE the old int64 ceiling and pins
  * the result against BigInt ground truth computed driver-side. An int64
  * pipeline on these fixtures would either wrap (sign-flip, pre-ANSI) or
  * throw — either way it could not produce these values, so a green run
  * proves the decimal path is the one executing.
  *
  * Sites: item_cf_recs' cos²·ppm (GraphQueries.Cos2PpmExpr), quality_auc's
  * Mann-Whitney ppm (TrainingPrep.AucPpmExpr + the decimal u2 term),
  * embed_top_direction's mat-vec/Rayleigh sums
  * (SimilarityQueries.matvecSum), filter_correlation's cubic moments and
  * mixture_temperature's micro-weights (exercised structurally — their
  * sums are plan-inline; the dtype assertions pin that the accumulators
  * really are decimal, so ANSI decimal-overflow semantics apply). */
class OverflowPolicySuite extends SparkSpec {

  import org.apache.spark.sql.types.DecimalType

  test("item_cf_recs cos2_ppm: exact above the old co ≈ 3e6 int64 ceiling") {
    import spark.implicits._
    // co² = 1.6e19, ·10⁶ = 1.6e25 — six orders of magnitude past int64
    val co = 4000000000L; val di = 5000000000L; val dn = 6400000000L
    val row = Seq((co, di, dn)).toDF("co", "di", "dn")
    val got = row.select(expr(graft.graph.GraphQueries.Cos2PpmExpr).as("ppm"))
      .head().getLong(0)
    val want = (BigInt(co) * BigInt(co) * 1000000 / (BigInt(di) * BigInt(dn))).toLong
    assert(got == want, s"cos2_ppm $got != BigInt ground truth $want")
    assert(got == 500000L) // sanity: cos² = 0.5 exactly with these operands
  }

  test("quality_auc auc_ppm: exact above the old u2·10⁶ ≈ n=4e6 ceiling") {
    import spark.implicits._
    // u2 = 8e18 (near the int64 edge itself); u2·10⁶ = 8e24
    val u2 = BigInt("8000000000000000000")
    val nPos = 3000000000L; val nNeg = 2000000000L
    val row = Seq((u2.toString, nPos, nNeg)).toDF("u2s", "n_pos", "n_neg")
      .select(expr("cast(u2s as decimal(38,0))").as("u2"), col("n_pos"), col("n_neg"))
    val got = row.select(expr(graft.pipelines.TrainingPrep.AucPpmExpr).as("ppm"))
      .head().getLong(0)
    val want = (u2 * 1000000 / (2 * BigInt(nPos) * BigInt(nNeg))).toLong
    assert(got == want, s"auc_ppm $got != BigInt ground truth $want")
    // the u2 accumulation itself: per-score decimal terms summing past int64
    val hist = Seq((2000000000L, 1500000000L, 500000000L),
                   (2500000000L, 3000000000L, 700000000L))
      .toDF("c_pos", "neg_below", "c_neg")
    val u2got = hist.agg(sum(col("c_pos").cast("decimal(38,0)")
        * (lit(2L) * col("neg_below") + col("c_neg"))).as("u2"))
      .head().getDecimal(0)
    val u2want = BigInt(2000000000L) * (2 * BigInt(1500000000L) + 500000000L) +
      BigInt(2500000000L) * (2 * BigInt(3000000000L) + 700000000L)
    assert(BigInt(u2got.toBigInteger) == u2want,
      s"u2 sum $u2got != BigInt ground truth $u2want")
    assert(u2want > BigInt(Long.MaxValue), "fixture must exceed int64 to prove the point")
  }

  test("quality_isotonic iso_ppm: exact above the old fp ≈ 9.2e12 ceiling") {
    import org.apache.spark.sql.types.LongType
    import spark.implicits._
    // fp = 2e13 block positives: fp·10⁶ = 2e19, past int64 — the r12
    // ADVICE residual. Ground truth via BigInt; dtype must stay bigint.
    val fp = 20000000000000L; val fn = 30000000000000L
    val row = Seq((fp, fn)).toDF("fp", "fn")
      .select(expr(graft.pipelines.TrainingPrep.IsoPpmExpr).as("iso_ppm"))
    assert(row.schema("iso_ppm").dataType == LongType,
      s"iso_ppm must stay bigint, got ${row.schema("iso_ppm").dataType}")
    val got = row.head().getLong(0)
    val want = (BigInt(fp) * 1000000 / BigInt(fn)).toLong
    assert(got == want, s"iso_ppm $got != BigInt ground truth $want")
    assert(BigInt(fp) * 1000000 > BigInt(Long.MaxValue),
      "fixture must exceed int64 to prove the point")
  }

  test("embed_top_direction mat-vec sum: exact when the accumulation passes int64") {
    import spark.implicits._
    // two per-term products of 8e18 each (inside int64) summing to 1.6e19
    // (outside): only a decimal accumulator returns the true sum
    val rows = Seq((8000000000000000L, 1000L), (8000000000000000L, 1000L))
      .toDF("g_scaled", "vj")
    val got = rows.agg(graft.similarity.SimilarityQueries.matvecSum.as("s"))
      .head().getDecimal(0)
    val want = BigInt(8000000000000000L) * 1000 * 2
    assert(BigInt(got.toBigInteger) == want, s"matvec sum $got != $want")
    assert(want > BigInt(Long.MaxValue))
  }

  test("lowered accumulators really are decimal (ANSI decimal semantics apply)") {
    // dtype pins on the INTERNAL accumulators — the outputs are cast to
    // double/bigint either way, so output-schema checks could not detect
    // a regression back to bigint sums. The analyzed plan's aggregate
    // expressions carry the accumulator types: a revert of any site's
    // decimal(38,0) promotion removes every decimal cast from that
    // query's plan (neither source table has a decimal column, so any
    // decimal in the plan IS the lowering).
    val fc = graft.pipelines.DataSelection.filterCorrelation(spark, Sf0001)
    assert(fc.schema("spearman_rho").dataType.typeName == "double")
    val fcPlan = fc.queryExecution.analyzed.toString
    assert(fcPlan.contains("decimal(38,0)"),
      "filter_correlation's moment sums lost their DECIMAL(38,0) accumulators")
    val mt = graft.pipelines.DataSelection.mixtureTemperature(spark, Sf0001)
    assert(mt.schema("p").dataType.typeName == "double")
    val mtPlan = mt.queryExecution.analyzed.toString
    assert(mtPlan.contains("decimal(38,0)"),
      "mixture_temperature's w_micro/tot lost their DECIMAL(38,0) carriers")
    val auc = graft.pipelines.TrainingPrep.qualityAuc(spark, Sf0001)
    assert(auc.queryExecution.analyzed.toString.contains("decimal(38,0)"),
      "quality_auc's u2 sum lost its DECIMAL(38,0) accumulator")
    val etd = graft.similarity.SimilarityQueries.embedTopDirection(spark, Sf0001)
    assert(etd.queryExecution.analyzed.toString.contains("decimal(38,0)"),
      "embed_top_direction's sums lost their DECIMAL(38,0) accumulators")
    graft.Caches.drain()
    // the factored mat-vec accumulator, pinned at the dtype level directly
    import spark.implicits._
    val probe = Seq((1L, 2L)).toDF("g_scaled", "vj")
      .agg(graft.similarity.SimilarityQueries.matvecSum.as("s"))
    assert(probe.schema("s").dataType.isInstanceOf[DecimalType],
      s"matvec accumulator must be decimal, got ${probe.schema("s").dataType}")
  }
}
