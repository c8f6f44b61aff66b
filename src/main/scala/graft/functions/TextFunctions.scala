package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the LLM-data-pipeline operators:
  * tokenization, shingling, cross-engine-stable hashing, MinHash
  * signatures, SimHash fingerprints. All built-in expressions — no
  * UDFs — so everything stays codegen'd and scales to 100 TB.
  *
  * Hashing convention: the first 8 (or 15) hex chars of md5 as an
  * integer. md5 is identical in every engine, which is what lets the
  * DuckDB oracle reproduce signatures bit-for-bit.
  */
object TextFunctions {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count (whitespace tokenizer; empty text -> 0). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(split(trim(text), "\\s+")))

  /** Distinct word n-gram shingles, joined by single spaces. Empty
    * array when the text has fewer than n words (sequence() would
    * otherwise count down).
    */
  def shingles(text: Column, n: Int): Column = {
    val words = tokens(text)
    when(size(words) >= n,
      array_distinct(transform(
        sequence(lit(1), size(words) - (n - 1)),
        i => array_join(slice(words, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** 32-bit-range integer hash of a string: first 8 hex chars of md5.
    * Uniform, deterministic, reproducible in any engine with md5.
    */
  def md5Int32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 60-bit integer hash: first 15 hex chars of md5 (fits a signed
    * 64-bit long with headroom for bit arithmetic).
    */
  def md5Int60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  // ----------------------------------------------------------------
  // MinHash
  // ----------------------------------------------------------------

  /** Universal-hash parameters h_i(x) = (a_i * x + b_i) mod P. With
    * x < 2^32 and a <= 127, a*x + b < 2^39 — no 64-bit overflow.
    */
  val MinhashP: Long = 2147483647L // 2^31 - 1 (Mersenne prime)
  val MinhashAB: Seq[(Int, Int)] = Seq(
    (7, 101), (11, 211), (13, 307), (17, 401),
    (19, 503), (23, 601), (29, 701), (31, 809),
    (37, 907), (41, 1009), (43, 1103), (47, 1201),
    (53, 1301), (59, 1409), (61, 1499), (67, 1601))

  /** MinHash signature from a pre-hashed integer array, computed in
    * ONE pass over the shingles (single higher-order aggregate whose
    * accumulator holds all k running minima). Crucial at scale: the
    * naive per-hash formulation re-evaluates the (md5) hash transform
    * k times per row because Catalyst's subexpression elimination
    * does not cross lambda boundaries — measured 16x slower.
    *
    * Pass a *materialized* ints column (cache or a prior stage), not
    * an inline transform, or CollapseProject re-inlines the hashing.
    */
  def minhashSignatureFromInts(ints: Column): Column =
    aggregate(ints,
      array_repeat(lit(MinhashP), MinhashAB.size),
      (acc, x) => array(MinhashAB.zipWithIndex.map { case ((a, b), i) =>
        least(element_at(acc, i + 1), (x * a + b) % MinhashP)
      }: _*))

  /** Convenience wrapper: hash + signature in one expression (fine
    * for one-off use; operators materialize the ints column first).
    */
  def minhashSignature(shingleArr: Column): Column =
    minhashSignatureFromInts(
      graft.expressions.HashFunctions.md5_int_array32(shingleArr))

  /** LSH band keys: the signature split into `bands` groups of
    * `rowsPerBand`, each joined to a comma-separated key. Docs sharing
    * any band key become candidate pairs.
    */
  def minhashBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { j =>
      array_join(slice(sig, j * rowsPerBand + 1, rowsPerBand), ",")
    }: _*)

  // ----------------------------------------------------------------
  // SimHash
  // ----------------------------------------------------------------

  /** Number of SimHash bits (60: fits md5Int60). */
  val SimhashBits: Int = 60

  /** SimHash stage 1: per-bit set counts over a pre-hashed integer
    * array, in ONE aggregate pass (accumulator = 60 running counts).
    */
  def simhashBitCounts(ints: Column): Column =
    aggregate(ints,
      array_repeat(lit(0L), SimhashBits),
      (acc, x) => array((0 until SimhashBits).map { b =>
        element_at(acc, b + 1) + pmod(shiftright(x, b), lit(2))
      }: _*))

  /** SimHash stage 2: fingerprint from materialized (counts, total)
    * columns — 60 cheap array lookups. The two-stage split exists
    * because Catalyst re-evaluates non-trivial subexpressions inside
    * each lambda/branch (no CSE across them): fused naively, the
    * count pass re-runs 60 times. Operators put a materialization
    * boundary (cache / prior stage) between the stages.
    */
  def simhashFromCounts(counts: Column, total: Column): Column =
    (0 until SimhashBits).map { b =>
      when(element_at(counts, b + 1) * 2 > total, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Convenience wrapper (small inputs / tests only: recomputes the
    * hash transform per stage — see simhashFromCounts scaladoc).
    */
  def simhash(tokenArr: Column): Column = {
    val ints = transform(tokenArr, md5Int60 _)
    simhashFromCounts(simhashBitCounts(ints), size(ints))
  }

  /** Hamming distance between two SimHash fingerprints. */
  def hammingDistance(f1: Column, f2: Column): Column =
    bit_count(f1.bitwiseXOR(f2))

  // ----------------------------------------------------------------
  // Fingerprinting
  // ----------------------------------------------------------------

  /** PII-style scrub: every digit run collapsed to a placeholder
    * token — the pre-training hygiene pass that strips numeric
    * identifiers (account numbers, phone digits, raw ids) from text
    * destined for a training corpus. Codegen'd regexp_replace, no
    * UDF; DuckDB parity needs the 'g' flag (Spark replaces all
    * matches by default).
    */
  def redactDigits(c: Column, placeholder: String = "<NUM>"): Column =
    regexp_replace(c, "[0-9]+", placeholder)

  /** Content fingerprint of normalized text (lowercase, all
    * non-alphanumerics stripped): stable under whitespace or
    * punctuation-only edits.
    */
  def contentFingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))

  /** Polynomial rolling hash over a token stream: h := (h*31 + hash(w))
    * mod P, folded left over materialized token-hash ints. Order
    * sensitive (unlike the md5 fingerprint) — equal only for equal
    * token sequences — and incrementally updatable, which is what a
    * streaming dedup keeps as state.
    */
  def rollingHashFromInts(ints: Column): Column =
    aggregate(ints, lit(0L), (h, x) => (h * 31 + x) % MinhashP)

  /** Convenience: rolling hash of whitespace tokens (native array
    * hashing — see graft.expressions.Md5IntArray).
    */
  def rollingHash(text: Column): Column =
    rollingHashFromInts(graft.expressions.HashFunctions.md5_int_array32(tokens(text)))
}
