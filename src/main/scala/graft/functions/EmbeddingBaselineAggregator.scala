package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing a per-group embedding baseline —
  * element-wise mean and population variance over `Array[Float]`
  * vectors — the reference's incremental (μ, diag Σ, n) profile
  * (SURVEY A7, crates/mnemo-core/src/anomaly/outlier.rs:104-251,
  * model/embedding_baseline.rs).
  *
  * The buffer is (n, Σx, Σx²) per dimension: merge-associative, so the
  * aggregation is one shuffle with map-side partial combine — the
  * custom-Aggregator box of SURVEY §2.12. Variance uses the
  * sum-of-squares identity (matches the reference's incremental
  * update, adequate for unit-scale embedding coordinates).
  */
object EmbeddingBaselineAggregator {

  case class Buffer(n: Long, sum: Array[Double], sumSq: Array[Double])

  case class Baseline(n: Long, mu: Array[Double], varDiag: Array[Double])

  def forDim(dim: Int): Aggregator[Array[Float], Buffer, Baseline] =
    new Aggregator[Array[Float], Buffer, Baseline] {

      override def zero: Buffer =
        Buffer(0L, new Array[Double](dim), new Array[Double](dim))

      override def reduce(b: Buffer, v: Array[Float]): Buffer = {
        // null vector = skipped row (not counted, not an executor NPE):
        // one corrupt upstream record must not abort the aggregation
        // or deflate the baseline
        if (v == null) return b
        var i = 0
        while (i < dim && i < v.length) {
          val x = v(i).toDouble
          b.sum(i) += x
          b.sumSq(i) += x * x
          i += 1
        }
        Buffer(b.n + 1, b.sum, b.sumSq)
      }

      override def merge(a: Buffer, b: Buffer): Buffer = {
        var i = 0
        while (i < dim) {
          a.sum(i) += b.sum(i)
          a.sumSq(i) += b.sumSq(i)
          i += 1
        }
        Buffer(a.n + b.n, a.sum, a.sumSq)
      }

      override def finish(b: Buffer): Baseline = {
        if (b.n == 0) return Baseline(0, new Array[Double](dim), new Array[Double](dim))
        val mu = new Array[Double](dim)
        val v = new Array[Double](dim)
        var i = 0
        while (i < dim) {
          mu(i) = b.sum(i) / b.n
          v(i) = math.max(0.0, b.sumSq(i) / b.n - mu(i) * mu(i))
          i += 1
        }
        Baseline(b.n, mu, v)
      }

      override def bufferEncoder: Encoder[Buffer] = Encoders.product[Buffer]
      override def outputEncoder: Encoder[Baseline] = Encoders.product[Baseline]
    }
}
