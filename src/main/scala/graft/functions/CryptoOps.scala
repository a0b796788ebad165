package graft.functions

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-at-rest encryption and read-provenance signing — the two
  * crypto UDF surfaces of the reference (SURVEY P4/P8/X12:
  * encryption.rs:1-176, provenance.rs:1-356, recall.rs:795-817).
  *
  * AES-GCM rides on Spark's built-in `aes_encrypt`/`aes_decrypt`
  * (codegen'd, random-IV GCM — same mode as the reference). HMAC-SHA256
  * has no Spark builtin, so it is the one genuine UDF in the engine;
  * it runs once per *result set* (receipt signing), never in a per-row
  * hot path, so the UDF boundary costs nothing at scale.
  */
object CryptoOps {

  /** AES-256-GCM encrypt (random IV, authenticated). Key must be 16, 24
    * or 32 bytes. Returns binary: IV ‖ ciphertext ‖ tag. */
  def encryptContent(content: Column, key: Column): Column =
    aes_encrypt(content.cast("binary"), key.cast("binary"), lit("GCM"))

  /** AES-256-GCM decrypt; throws on tamper (auth tag mismatch) — use
    * [[tryDecryptContent]] for quarantine-style soft handling. */
  def decryptContent(blob: Column, key: Column): Column =
    aes_decrypt(blob, key.cast("binary"), lit("GCM")).cast("string")

  /** Null on auth failure instead of failing the job. */
  def tryDecryptContent(blob: Column, key: Column): Column =
    try_aes_decrypt(blob, key.cast("binary"), lit("GCM")).cast("string")

  private def hmacHex(key: Array[Byte], data: Array[Byte]): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data).map("%02x".format(_)).mkString
  }

  /** HMAC-SHA256 over a string column, hex output. */
  def hmacSha256(data: Column, key: String): Column = {
    val keyBytes = key.getBytes("UTF-8")
    val f = udf((s: String) =>
      if (s == null) null else hmacHex(keyBytes, s.getBytes("UTF-8")))
    f(data)
  }

  /** Read-provenance receipt (P8): one HMAC signature over the
    * rank-ordered chain hashes of a recall result set. Any substitution,
    * omission or reorder of returned records changes the receipt. The
    * aggregation is deterministic (sorted struct collect), the signature
    * is one driver-free UDF call on a single row. */
  def provenanceReceipt(result: DataFrame, idCol: String, chainHashCol: String,
      key: String): DataFrame =
    result.agg(
      count(lit(1)).as("n_records"),
      hmacSha256(
        concat_ws("|",
          transform(
            array_sort(collect_list(struct(col(idCol), col(chainHashCol)))),
            p => p.getField(chainHashCol))),
        key).as("receipt"))
}
