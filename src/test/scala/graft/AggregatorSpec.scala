package graft

import graft.functions.EmbeddingBaselineAggregator
import org.apache.spark.sql.functions._

class AggregatorSpec extends SparkSpec {

  test("typed baseline Aggregator matches the SQL posexplode baseline (mu and var)") {
    import spark.implicits._
    val e = Tables.embeddings(spark, Sf)
    // typed path: one shuffle, map-side partial combine
    val typed = e.select(col("label"), col("embedding"))
      .as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(EmbeddingBaselineAggregator.forDim(64).toColumn.name("baseline"))
      .map { case (label, b) => (label, b.n, b.mu, b.varDiag) }
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // SQL path: posexplode + avg/var_pop
    val sql = e.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .withColumn("x", col("x").cast("double"))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n"), avg(col("x")).as("mu"), var_pop(col("x")).as("v"))
      .collect()
      .groupBy(_.getAs[Int]("label"))

    sql.foreach { case (label, rows) =>
      val (tn, tmu, tvar) = typed(label)
      rows.foreach { r =>
        val d = r.getAs[Int]("dim")
        assert(r.getAs[Long]("n") == tn)
        assert(math.abs(r.getAs[Double]("mu") - tmu(d)) < 1e-9,
          s"label=$label dim=$d mu mismatch")
        assert(math.abs(r.getAs[Double]("v") - tvar(d)) < 1e-7,
          s"label=$label dim=$d var mismatch")
      }
    }
  }

  test("aggregator input longer/shorter than dim is handled (truncate / ignore missing)") {
    import spark.implicits._
    val agg = EmbeddingBaselineAggregator.forDim(2)
    val ds = Seq(("g", Array(1.0f, 2.0f)), ("g", Array(3.0f, 4.0f, 9.0f))).toDS()
    val out = ds.groupByKey(_._1).mapGroups { (_, it) =>
      val a = agg
      var buf = a.zero
      it.foreach(v => buf = a.reduce(buf, v._2))
      a.finish(buf)
    }.collect()(0)
    assert(out.n == 2)
    assert(out.mu.toSeq == Seq(2.0, 3.0))
  }
}
