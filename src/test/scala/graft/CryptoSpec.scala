package graft

import graft.functions.CryptoOps
import org.apache.spark.sql.functions._

class CryptoSpec extends SparkSpec {

  private val key = "0123456789abcdef0123456789abcdef" // 32 bytes -> AES-256

  test("AES-GCM roundtrip recovers plaintext; wrong key fails closed (null)") {
    import spark.implicits._
    val df = Seq("secret memory content", "another row").toDF("content")
    val enc = df.withColumn("blob", CryptoOps.encryptContent(col("content"), lit(key)))
    val dec = enc.withColumn("out", CryptoOps.decryptContent(col("blob"), lit(key)))
    assert(dec.filter(col("out") === col("content")).count() == 2)
    val wrong = enc.withColumn("out",
      CryptoOps.tryDecryptContent(col("blob"), lit("ffffffffffffffffffffffffffffffff")))
    assert(wrong.filter(col("out").isNull).count() == 2)
  }

  test("ciphertext is authenticated: flipping a byte fails decryption") {
    import spark.implicits._
    val df = Seq("tamper me").toDF("content")
    val enc = df.withColumn("blob", CryptoOps.encryptContent(col("content"), lit(key)))
    // flip the last byte (inside tag/ciphertext)
    val tampered = enc.withColumn("blob",
      concat(expr("substring(blob, 1, length(blob) - 1)"),
        expr("cast(x'00' as binary)")))
    val out = tampered.withColumn("out",
      CryptoOps.tryDecryptContent(col("blob"), lit(key)))
    assert(out.filter(col("out").isNull).count() == 1)
  }

  test("HMAC-SHA256 matches the RFC 4231 test vector") {
    import spark.implicits._
    // RFC 4231 case 2: key "Jefe", data "what do ya want for nothing?"
    val expected = "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843"
    val got = Seq("what do ya want for nothing?").toDF("d")
      .select(CryptoOps.hmacSha256(col("d"), "Jefe").as("h"))
      .collect()(0).getString(0)
    assert(got == expected)
  }

  test("provenance receipt is stable under row order but changes under substitution") {
    import spark.implicits._
    val a = Seq(("m1", "h1"), ("m2", "h2")).toDF("id", "chain_hash")
    val b = Seq(("m2", "h2"), ("m1", "h1")).toDF("id", "chain_hash") // reordered
    val c = Seq(("m1", "h1"), ("m2", "hX")).toDF("id", "chain_hash") // forged
    def receipt(df: org.apache.spark.sql.DataFrame): String =
      CryptoOps.provenanceReceipt(df, "id", "chain_hash", "k").collect()(0).getString(1)
    assert(receipt(a) == receipt(b))
    assert(receipt(a) != receipt(c))
  }
}
