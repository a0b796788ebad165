package graft

class PipelineSpec extends SparkSpec {

  test("quality gate keeps at least the upper half of every language stratum") {
    val d = Tables.documents(spark, Sf)
    val perLang = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SparkEntry.queries("pl1_quality_gate")(spark, Sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      val k = kept.getOrElse(lang, 0L)
      assert(k >= n / 2, s"$lang kept $k of $n — median gate must keep >= half")
      assert(k <= n, s"$lang kept more than exists")
    }
  }

  test("stratified sample is a subset, reproducible, and near the per-stratum target") {
    val rows = SparkEntry.queries("pl2_stratified_sample")(spark, Sf).collect()
    rows.foreach { r =>
      val total = r.getAs[Long]("n_total")
      val keptN = r.getAs[Long]("n_kept")
      assert(keptN <= total)
      // acceptance rate min(1, 100/total) over 256 uniform buckets: allow
      // generous binomial slack, but catch off-by-8x bugs
      val expect = math.min(total.toDouble, 100.0 * total / math.max(total, 100.0))
      assert(keptN <= expect * 3 + 16, s"${r.getAs[String]("lang")}: $keptN vs expect ~$expect")
    }
    val again = SparkEntry.queries("pl2_stratified_sample")(spark, Sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("corpus mix weights sum to ~1 and allocations never exceed the budget") {
    val rows = SparkEntry.queries("pl3_corpus_mix")(spark, Sf).collect()
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights sum to $wsum")
    val alloc = rows.map(_.getAs[Long]("alloc_tokens")).sum
    assert(alloc <= 100000L)
    assert(alloc >= 100000L - rows.length, "floor() loses at most 1 token per source")
    // sqrt rebalancing: every source's weight share must exceed its
    // proportional-token share if it is below-average sized
    val toks = rows.map(r => r.getAs[String]("source") -> r.getAs[Long]("est_tokens")).toMap
    val totalToks = toks.values.sum.toDouble
    rows.foreach { r =>
      val share = toks(r.getAs[String]("source")) / totalToks
      if (share < 1.0 / rows.length)
        assert(r.getAs[Double]("weight") >= share,
          s"${r.getAs[String]("source")}: sqrt mix must upweight small sources")
    }
  }
}
