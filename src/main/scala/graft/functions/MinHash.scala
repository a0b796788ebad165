package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash / SimHash sketches for near-duplicate detection, built from
  * codegen'd collection functions over md5 — no UDFs, and the exact same
  * computation is expressible in ANSI-ish SQL for the DuckDB oracle.
  *
  * Design notes for 100 TB: both sketches reduce each document to a
  * constant-size signature in a single narrow (no-shuffle) projection;
  * the only shuffle in an LSH dedup job is the band-key groupBy, whose
  * key cardinality is tunable via (nHashes, rowsPerBand). The hash
  * domain is lowercase md5 hex, totally ordered lexicographically, so
  * "min over shingles" needs no integer conversion and agrees
  * byte-for-byte across engines.
  *
  * Capability parity: the reference dedups via pairwise embedding cosine
  * (crates/mnemo-core/src/query/reflection.rs:384-470); MinHash/SimHash
  * are the text-side scale path for the same pass.
  */
object MinHash {

  private val Sep = ""
  private val HexDigits = "0123456789abcdef"

  /** Per-shingle md5 digests. Bind the result to a named column BEFORE
    * passing it to [[signature]]: lambda bodies re-evaluate non-attribute
    * argument expressions per element access, so an inlined digest array
    * would recompute every md5 once per hash function. */
  def shingleDigests(shingles: Column): Column = transform(shingles, s => md5(s))

  /** k-minhash signature over a digest array: element i is min over
    * digests of hᵢ(d), where hᵢ(d) is the 16-hex-char window of d‖d
    * starting at hex offset 2i. One md5 per shingle total (not one per
    * hash function): the k "hash functions" are overlapping 64-bit views
    * of the same digest — each window still mixes every input bit, and
    * min-over-shingles selects (near-)independently per window. Cuts the
    * dominant sketch cost k-fold vs the md5(i‖s) formulation. */
  def signature(digests: Column, nHashes: Int): Column =
    array((0 until nHashes).map { i =>
      // the d‖d wrap only matters once the window runs past the 32-hex
      // digest end (i > 8); below that a plain substring is cheaper
      array_min(transform(digests, d =>
        if (2 * i + 16 <= 32) substring(d, 2 * i + 1, 16)
        else substring(concat(d, d), 2 * i + 1, 16)))
    }: _*)

  /** LSH band keys: the signature is cut into bands of `rowsPerBand`
    * consecutive hashes; each band key is the md5 of (bandIdx ⊕ joined
    * member hashes). Two docs collide on a band iff that band of their
    * signatures is identical. */
  def bandKeys(sig: Column, nHashes: Int, rowsPerBand: Int): Column = {
    require(nHashes % rowsPerBand == 0, "bands must tile the signature")
    val nBands = nHashes / rowsPerBand
    array((0 until nBands).map { b =>
      val members = (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1))
      md5(concat_ws(Sep, lit(b.toString) +: members: _*))
    }: _*)
  }

  /** 16-bit SimHash over a token array (with multiplicity). Each token
    * contributes ±1 per bit position, bits taken from the first 4 hex
    * chars of md5(token); the sketch bit is the sign of the sum.
    * Returned as a long in [0, 65535]. */
  def simhash16(toks: Column): Column = {
    // per-token 4-hex-char prefix, computed once
    val hexes = transform(toks, t => substring(md5(t), 1, 4))
    // bit p of token-hex h: nibble = index of hex char p/4 in the digit
    // string; bit = (nibble >> (3 - p%4)) & 1 — all integer arithmetic
    def bitOf(h: Column, p: Int): Column = {
      val nib = instr(lit(HexDigits), substring(h, p / 4 + 1, 1)) - 1
      floor(nib / math.pow(2, 3 - p % 4)).cast("long") % 2
    }
    val bitCols = (0 until 16).map { p =>
      val bitSum = aggregate(hexes, lit(0L), (acc, h) => acc + bitOf(h, p) * 2 - 1)
      when(bitSum > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }
}
