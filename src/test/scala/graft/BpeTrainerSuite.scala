package graft

import org.apache.spark.sql.functions._

import graft.pipelines.BpeTrainer

/** Engine-internal invariants for BPE merge training — algorithmic
  * properties that hold independently of the driver's DuckDB compare
  * (which pins the exact merge trajectory at sf0.01). */
class BpeTrainerSuite extends SparkSpec {

  test("bpe_train: one merge per round, ranks sequential, counts non-increasing-ish sane") {
    val merges = BpeTrainer.bpeTrain(spark, Sf0001).collect()
    assert(merges.length == 8)
    assert(merges.map(_.getAs[Int]("rank")).toSeq == (1 to 8))
    assert(merges.forall(_.getAs[Long]("freq") > 0))
    // Each merged token is the concatenation of single chars learned so far,
    // so lhs/rhs are always drawn from {chars} ∪ {earlier merges}.
    val learned = collection.mutable.Set.empty[String]
    merges.foreach { m =>
      val (l, r) = (m.getAs[String]("lhs"), m.getAs[String]("rhs"))
      assert(l.length == 1 || learned.contains(l), s"lhs $l not derivable")
      assert(r.length == 1 || learned.contains(r), s"rhs $r not derivable")
      learned += (l + r)
    }
  }

  test("bpe_train: first merge is the true argmax adjacent-char pair of the corpus") {
    // Recount adjacent character pairs brute-force and compare with round 1.
    val first = BpeTrainer.bpeTrain(spark, Sf0001).orderBy("rank").collect().head
    val brute = Tables.documents(spark, Sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("pair"))
      .collect().head
    assert(first.getAs[String]("lhs") + first.getAs[String]("rhs")
      == brute.getAs[String]("pair"))
    assert(first.getAs[Long]("freq") == brute.getAs[Long]("n"))
  }

  test("bpe_encode: conservation — bpe tokens per doc between 1x and charlen x ws tokens") {
    val enc = BpeTrainer.bpeEncode(spark, Sf0001)
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), w => w =!= "")).as("n_ws"))
    val joined = enc.join(docs, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (bpe, ws, nWs) = (r.getAs[Long]("bpe_tokens"), r.getAs[Long]("ws_tokens"),
        r.getAs[Int]("n_ws").toLong)
      assert(ws == nWs, "ws_tokens must equal the whitespace token count")
      assert(bpe >= ws, "merging can never produce fewer symbols than words")
    }
  }

  test("bpe_encode: the trained-vocab join is broadcast, not shuffled") {
    val plan = BpeTrainer.bpeEncode(spark, Sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocabulary must broadcast against the corpus side:\n$plan")
  }

  test("merge fold is left-to-right non-overlapping (aaa + (a,a) -> [aa, a])") {
    import spark.implicits._
    val out = Seq(("aaab", Seq("a", "a", "a", "b"))).toDF("word", "syms")
      .withColumn("lhs", lit("a")).withColumn("rhs", lit("a"))
      .selectExpr(
        """aggregate(syms, cast(array() as array<string>),
          |  (acc, x) -> CASE
          |    WHEN size(acc) > 0 AND element_at(acc, -1) = lhs AND x = rhs
          |    THEN concat(slice(acc, 1, size(acc) - 1), array(concat(lhs, rhs)))
          |    ELSE concat(acc, array(x)) END) AS merged""".stripMargin)
      .collect().head.getSeq[String](0)
    assert(out == Seq("aa", "a", "b"))
  }
}
