package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.MinHash.shingles

/** SimHash near-duplicate detection (SURVEY C3).
  *
  * 64-bit SimHash over distinct word shingles: each shingle's md5
  * contributes ±1 per bit position; the sign of each positional sum is
  * that bit of the fingerprint. Near-dups are pairs within Hamming
  * distance `maxHamming`.
  *
  * Portability (SURVEY §4.1): bits come from md5 hex chars — bit i of
  * a signature is bit (i mod 4) of hex char (i div 4), extracted with
  * plain integer arithmetic (ascii offset + floor-div + mod, no
  * engine-native hash or platform ints). The fingerprint is emitted as
  * a 64-char '0'/'1' string so any engine compares it identically.
  *
  * Scale & execution shape: shingles are EXPLODED, hashed once per row
  * (a plain projection, so codegen computes md5 exactly once), then 64
  * per-bit ±1 sums hash-aggregate per doc — one shuffle on doc id,
  * whole-stage codegen throughout, map-side partials collapsing the
  * explode. Pair-finding is banded by the pigeonhole principle: split
  * 64 bits into `chunks` substrings — any pair with hamming < chunks
  * must agree exactly on ≥1 chunk — so the only further shuffle is the
  * self-join on (chunk_idx, chunk_value), which reuses the aggregate's
  * exchange; verification runs only on those candidates, never O(n²).
  */
object SimHash {

  /** 0-15 value of the 1-based `idx`-th hex char of md5 hex string
    * `h`: '0'-'9' → ascii-48, 'a'-'f' → ascii-87. */
  private def hexVal(h: Column, idx: Int): Column = {
    val a = ascii(substring(h, idx, 1))
    when(a >= 97, a - 87).otherwise(a - 48)
  }

  /** ±1 contribution of md5-hex column `h` at bit i (0-63). */
  private def bitSign(h: Column, i: Int): Column = {
    val v = hexVal(h, i / 4 + 1)
    when(pmod(floor(v / lit(1 << (i % 4))), lit(2)) === 1, 1).otherwise(-1)
  }

  /** 64-char '0'/'1' fingerprint per id from exploded (id, shingle)
    * rows: 64 ±1 sums in one hash aggregate, then sign bits. */
  def fingerprints(exploded: DataFrame, id: String, shingle: String): DataFrame = {
    val hashed = exploded.select(col(id), md5(col(shingle)).as("__h"))
    val aggs = (0 until 64).map(i => sum(bitSign(col("__h"), i)).as(s"b$i"))
    hashed.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
      .select(col(id),
        concat((0 until 64).map(i => when(col(s"b$i") > 0, lit("1")).otherwise(lit("0"))): _*).as("sig"))
  }

  /** Hamming distance between two equal-length bit strings. */
  def hamming(a: Column, b: Column, bits: Int = 64): Column =
    size(filter(sequence(lit(1), lit(bits)),
      i => a.substr(i, lit(1)) =!= b.substr(i, lit(1))))

  /** Near-dup pairs within `maxHamming` (requires maxHamming <
    * chunks for losslessness). Returns (doc_a, doc_b, hamming). */
  def nearDupPairs(docs: DataFrame, id: Column, text: Column,
                   n: Int = 3, maxHamming: Int = 7, chunks: Int = 8): DataFrame = {
    require(maxHamming < chunks, "pigeonhole: need maxHamming < chunks")
    require(64 % chunks == 0, "chunks must divide 64")
    val width = 64 / chunks
    val sh = docs.select(id.as("id"), shingles(text, n).as("s"))
      .filter(size(col("s")) > 0)
    val sigs = fingerprints(sh.select(col("id"), explode(col("s")).as("sh")), "id", "sh")
    val chunked = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until chunks).map(c =>
        substring(col("sig"), c * width + 1, width)): _*)).as(Seq("ci", "cv")))
    val cand = chunked.as("a").join(chunked.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("a.sig").as("siga"),
        col("b.id").as("doc_b"), col("b.sig").as("sigb"))
      .distinct()
    cand.withColumn("hamming", hamming(col("siga"), col("sigb")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
