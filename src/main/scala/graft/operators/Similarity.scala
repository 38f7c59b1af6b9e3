package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Embedding similarity operators (SURVEY C5-C7): threshold pair
  * dedup, brute-force ANN top-k, and LSH-bucketed ANN.
  *
  * All scores are double cosine, rounded to 6 before thresholds and
  * ranking (SURVEY §4.3), with a vec-id tie-break so rankings are
  * total orders.
  *
  * Scale:
  *  - `cosinePairs` precomputes each vector's norm ONCE (map-side), so
  *    the pair stage is a single dot per pair. The all-pairs form is
  *    the exactness baseline; at 100 TB use `lshTopK`'s bucketing (or
  *    a blocking column) — same scores, candidates only.
  *  - `bruteForceTopK` broadcasts the (small) query set against the
  *    corpus: map-side scoring, one shuffle to rank per query.
  *  - `lshTopK` buckets vectors by random-hyperplane sign signatures
  *    (md5-seeded ±1 hyperplanes — deterministic, engine-portable,
  *    no stored model); L independent tables give recall; the only
  *    shuffle is the (table, signature) bucket join.
  */
object Similarity {

  /** Rounded cosine between two vector columns. */
  def score(a: Column, b: Column): Column = round(VectorFunctions.cosine(a, b), 6)

  /** (vec_a, vec_b, cosine) for all pairs with rounded cosine ≥ t.
    * Norms computed once per vector, not per pair. */
  def cosinePairs(vecs: DataFrame, id: Column, vec: Column, threshold: Double): DataFrame = {
    val v = vecs.select(id.as("id"), vec.as("v"))
      .withColumn("nrm", VectorFunctions.norm(col("v")))
    val pair = v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
    pair.withColumn("cosine",
        round(VectorFunctions.cosineFrom(
          VectorFunctions.dot(col("a.v"), col("b.v")), col("a.nrm"), col("b.nrm")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"), col("cosine"))
  }

  /** Exact top-k neighbors per query vector (query set should be
    * small — it is broadcast). Returns (query_id, rank, vec_id,
    * cosine), rank by (cosine desc, vec_id). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     id: Column, vec: Column, k: Int): DataFrame = {
    val c = corpus.select(id.as("vec_id"), vec.as("cv"))
      .withColumn("cn", VectorFunctions.norm(col("cv")))
    val q = queries.select(id.as("query_id"), vec.as("qv"))
      .withColumn("qn", VectorFunctions.norm(col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(VectorFunctions.cosineFrom(
        VectorFunctions.dot(col("qv"), col("cv")), col("qn"), col("cn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
  }

  /** ±1 hyperplane component for (table t, plane p, dim d), derived
    * from bit 0 of md5("t_p:d") — deterministic, no stored model. */
  private def hyperSign(t: Column, p: Column, d: Column): Column = {
    val a = ascii(substring(md5(concat(t.cast("string"), lit("_"), p.cast("string"),
      lit(":"), d.cast("string"))), 1, 1))
    val v = when(a >= 97, a - 87).otherwise(a - 48)
    when(pmod(v, lit(2)) === 1, lit(1.0)).otherwise(lit(-1.0))
  }

  /** LSH signature for one table: `planes` sign bits of hyperplane
    * dot products, as a bit string. */
  def lshSignature(vec: Column, table: Column, planes: Int, dims: Int): Column =
    concat_ws("", transform(sequence(lit(0), lit(planes - 1)), { p =>
      val d = aggregate(
        zip_with(vec, sequence(lit(0), lit(dims - 1)),
          (x, i) => x.cast("double") * hyperSign(table, p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, "1").otherwise("0")
    }))

  /** ANN via L hash tables of `planes`-bit signatures: candidates
    * share a (table, signature) bucket with the query; exact rounded
    * cosine ranks them. Returns (query_id, rank, vec_id, cosine) with
    * rank ≤ k. The bucket join is the only shuffle. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, id: Column, vec: Column,
              k: Int, tables: Int = 4, planes: Int = 6, dims: Int = 64): DataFrame = {
    def bucketed(df: DataFrame, idName: String, vecName: String) =
      df.select(id.as(idName), vec.as(vecName))
        .select(col(idName), col(vecName), explode(sequence(lit(0), lit(tables - 1))).as("t"))
        .withColumn("sig", lshSignature(col(vecName), col("t"), planes, dims))
    val c = bucketed(corpus, "vec_id", "cv")
    val q = bucketed(queries, "query_id", "qv")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    c.join(broadcast(q), Seq("t", "sig"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("qv"), col("cv"))
      .distinct() // a pair can collide in several tables
      .withColumn("cosine", score(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
  }
}
