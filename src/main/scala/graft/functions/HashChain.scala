package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SHA-256 hash-chain build & verify as window passes.
  *
  * Capability parity: the reference hash-chains every memory/event row to
  * its predecessor within an (agent, thread) stream
  * (crates/mnemo-core/src/hash.rs:9-24, query/remember.rs:103-111) and
  * verifies the chain by a full ordered rescan (hash.rs:41-98).
  *
  * Spark-first design: instead of a per-insert `ORDER BY ts DESC LIMIT 1`
  * probe, the whole chain — build AND verify — is one `lag()` window pass
  * per partition key. The chain links each row to the *content hash* of
  * its predecessor (link hash = sha256(content_hash || prev_content_hash)),
  * which keeps the computation a single window pass (embarrassingly
  * parallel across chain keys at 100 TB) while preserving the tamper
  * property: flipping any byte of any row breaks that row's own link and
  * its successor's.
  */
object HashChain {

  /** Field separator inside the hashed payload (ASCII 0x01): prevents
    * boundary ambiguity ("ab"+"c" vs "a"+"bc") without colliding with
    * realistic column bytes. DuckDB equivalent: `chr(1)`. */
  val Sep = "\u0001"

  /** Content hash of a row: sha256 over the concatenated identity cols. */
  def contentHash(cols: Column*): Column =
    sha2(concat_ws(Sep, cols: _*), 256)

  /** Adds `content_hash`, `prev_hash` and `chain_hash` columns.
    *
    * @param partitionCols chain key (e.g. agent_id, thread_id)
    * @param orderCols     total order within the chain — MUST be
    *                      deterministic (include a unique id tiebreak)
    */
  def buildChain(
      df: DataFrame,
      hashInput: Seq[Column],
      partitionCols: Seq[Column],
      orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    df.withColumn("content_hash", contentHash(hashInput: _*))
      .withColumn("prev_hash", lag(col("content_hash"), 1).over(w))
      .withColumn("chain_hash",
        sha2(concat(col("content_hash"), coalesce(col("prev_hash"), lit(""))), 256))
  }

  /** Verifies a previously built chain: recomputes every link and flags
    * rows whose stored linkage disagrees. Returns the df with a
    * `chain_valid` boolean; `false` rows localize the tamper point. */
  def verifyChain(
      df: DataFrame,
      hashInput: Seq[Column],
      partitionCols: Seq[Column],
      orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    val recomputed = contentHash(hashInput: _*)
    val expectPrev = lag(recomputed, 1).over(w)
    df.withColumn("chain_valid",
      col("content_hash") === recomputed &&
        coalesce(col("prev_hash"), lit("")) === coalesce(expectPrev, lit("")) &&
        col("chain_hash") === sha2(concat(recomputed, coalesce(expectPrev, lit(""))), 256))
  }
}
