package graft

import org.apache.spark.sql.functions._
import graft.operators.Embeddings

/** C53: the hashed random-projection embedding generator — unit
  * norm, scale invariance (the property that makes cosine on these
  * vectors meaningful), zero-norm contract, and partitioning
  * invariance of the integer sums. */
class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private def embed(rows: Seq[(Long, String)], dims: Int = 16) =
    Embeddings.project(rows.toDF("id", "t"), col("id"), col("t"), dims)
      .as[(Long, Long, Option[Seq[Double]])].collect().map(r => r._1 -> r).toMap

  test("unit norm, determinism, and tf scale-invariance") {
    val got = embed(Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),      // identical text
      (3L, "alpha beta alpha beta"),               // doubled bag of (4L)
      (4L, "alpha beta"),
      (5L, ""), (6L, null.asInstanceOf[String])))  // token-less
    val e1 = got(1L)._3.get
    assert(math.abs(e1.map(x => x * x).sum - 1.0) < 1e-4, s"unit norm, got $e1")
    assert(got(2L)._3.get == e1) // same text → identical vector
    // doubling every count scales the sums, not the direction: the
    // normalized vectors are exactly equal (integer sums, same ratio)
    assert(got(3L)._3.get == got(4L)._3.get)
    assert(got(3L)._2 == 4 && got(4L)._2 == 2) // multiplicity counted
    // zero-norm contract: NULL embedding, n_toks preserved
    assert(got(5L)._3.isEmpty && got(5L)._2 == 0)
    assert(got(6L)._3.isEmpty && got(6L)._2 == 0)
  }

  test("lane-compressed sums match a pure-Scala reference projection (r17 layout)") {
    // the optimization-round layout carries the per-dim ±1 sums in
    // 32-bit counter lanes (two per long); this pins the whole path —
    // md5 hex-char bit extraction, lane spread, 2·ones − n recovery,
    // exact-integer norm, round 6 — against an independent reference
    def ref(text: String, dims: Int): (Long, Option[Seq[Double]]) = {
      val toks = Option(text).getOrElse("").toLowerCase
        .split("\\s+").filter(_.nonEmpty).toSeq
      val md = java.security.MessageDigest.getInstance("MD5")
      val sums = new Array[Long](dims)
      for (t <- toks) {
        val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        for (j <- 0 until dims) {
          val v = Integer.parseInt(hex.charAt(j / 4).toString, 16)
          sums(j) += ((v >> (j % 4)) & 1) * 2 - 1
        }
      }
      val nrm2 = sums.map(s => s * s).sum
      if (nrm2 == 0) (toks.size.toLong, None)
      else (toks.size.toLong, Some(sums.toSeq.map(s =>
        BigDecimal(s.toDouble / math.sqrt(nrm2.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    }
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "x1", "y2", "z3")
    val docs = (0 until 60).map { i =>
      (i.toLong, (0 to i % 9).map(k => vocab((i * 7 + k * 3) % vocab.size)).mkString(" "))
    } :+ (60L, "") :+ (61L, "solo")
    for (dims <- Seq(7, 16, 64)) {
      val got = embed(docs, dims)
      for ((id, t) <- docs) {
        val (n, e) = ref(t, dims)
        assert(got(id)._2 == n, s"n_toks id=$id dims=$dims")
        assert(got(id)._3 == e, s"emb id=$id dims=$dims: ${got(id)._3} vs $e")
      }
    }
  }

  test("result invariant to partitioning; dims bound enforced") {
    val rows = (0L until 100L).map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3}"))
    val a = Embeddings.project(rows.toDF("id", "t").repartition(1),
      col("id"), col("t"), 16).as[(Long, Long, Option[Seq[Double]])].collect().toSet
    val b = Embeddings.project(rows.toDF("id", "t").repartition(13),
      col("id"), col("t"), 16).as[(Long, Long, Option[Seq[Double]])].collect().toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Embeddings.project(rows.toDF("id", "t"), col("id"), col("t"), 65)
    }
  }
}
