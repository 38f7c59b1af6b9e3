package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.VectorExpressions

/** Product-quantization ANN (SURVEY C27) — compressed-domain
  * similarity search in the IVFADC family (Jégou, Douze, Schmid,
  * "Product quantization for nearest neighbor search", TPAMI 2011).
  *
  * Vectors are L2-normalized, split into `m` subspaces, and each
  * subvector is replaced by the id of its nearest subspace centroid:
  * d floats become m small codes (64-dim float32 → 8 bytes here, a
  * 32× compression), which is what makes a 100 TB embedding corpus
  * scannable — the scan touches codes, not vectors.
  *
  * Search is ADC (asymmetric distance computation): each query
  * precomputes an m×k table of subspace dots against the centroids
  * (tiny, broadcast with the query), and a candidate's approximate
  * cosine is m array lookups summed — `zip_with(codes, tbl, …)` +
  * `aggregate`, fully codegen'd, no join fan-out. The top `rerank`
  * candidates per query are then re-scored EXACTLY against the full
  * vectors (one model-sized semi-join), so approximation decides only
  * WHICH candidates are considered, never their reported scores —
  * the same verify-exact discipline as the LSH/IVF/angular-cell
  * operators here.
  *
  * Training runs one Lloyd recursion for ALL subspaces at once: the
  * corpus explodes to (id, sub, subvector) rows, assignment is a
  * MAP-SIDE arg-max against literal centroids (per-subspace when()
  * chain — only the matching branch's k dots evaluate), and the
  * update is a (sub, cell, dim) mean — ONE shuffle per iteration,
  * independent of m. Only the m×k×(d/m) centroid model (= one
  * d-dim vector per cell column, ~k·d doubles) ever reaches the
  * driver, embedded as plan-time literals for the map-side encode.
  */
object PQ {

  /** Trained model: centroids(sub)(cell) = subspace centroid. */
  final case class Model(m: Int, k: Int, subDim: Int,
                         centroids: Seq[Seq[Seq[Double]]]) {
    require(centroids.length == m && centroids.forall(_.length == k))
  }

  /** L2-normalized d-dim view of `vec` (PQ operates on the unit
    * sphere so ADC dots approximate cosine directly). */
  private def unit(vec: Column): Column = {
    val v = vec.cast("array<double>")
    transform(v, x => x / VectorExpressions.norm(v))
  }

  /** Train the m×k subspace codebooks with `iters` Lloyd rounds,
    * seeded deterministically from the `k` lowest-id vectors'
    * subvectors. */
  def train(corpus: DataFrame, id: Column, vec: Column,
            m: Int = 8, k: Int = 16, iters: Int = 2): Model = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // ONE collect serves three needs: the dimensionality, the seed
    // codebooks (sliced driver-side), and the corpus-smaller-than-k
    // shrink — no separate dims job, no reliance on explode order
    val seeds = corpus
      .select(id.cast("long").as("id"), unit(vec).as("v")).orderBy(col("id")).limit(k)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    require(seeds.nonEmpty, "PQ.train: empty corpus — nothing to build a codebook from")
    val d = seeds.head._2.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val subDim = d / m
    val subs = corpus.select(id.as("id"), unit(vec).as("v"))
      .select(col("id"), posexplode(transform(sequence(lit(0), lit(m - 1)),
        s => slice(col("v"), s * subDim + 1, lit(subDim)))).as(Seq("sub", "sv")))

    // corpus smaller than k: shrink the codebook to the seeds that
    // exist (duplicate centroids would only waste code space)
    val kEff = seeds.length
    var model: Seq[((Int, Int), Seq[Double])] = for {
      (cell, (_, v)) <- seeds.zipWithIndex.map(_.swap).toSeq
      s <- 0 until m
    } yield ((s, cell), v.slice(s * subDim, (s + 1) * subDim))
    for (_ <- 0 until iters) {
      // map-side argmax against LITERAL centroids (the same shape as
      // `encode`): nearest by L2 ⇔ max of (sv·cv − |cv|²/2), chained
      // per subspace — no broadcast join, no (id, sub) shuffle; the
      // mean aggregation below is each iteration's only exchange
      val byKey = model.toMap
      val cellCol = (0 until m).foldLeft(lit(-1)) { (acc, s) =>
        val best = greatest((0 until kEff).flatMap(c => byKey.get((s, c)).map { cv =>
          struct(
            (VectorExpressions.dot(col("sv"), typedlit(cv)) -
              lit(cv.map(x => x * x).sum / 2)).as("sc"),
            lit(-c).as("nc"))
        }): _*)
        when(col("sub") === s, -best.getField("nc")).otherwise(acc)
      }
      val assigned = subs.select(col("sub"), cellCol.as("cell"), col("sv"))
      model = assigned
        .select(col("sub"), col("cell"), posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy(col("sub"), col("cell"), col("dim")).agg(avg(col("x")).as("mu"))
        .groupBy(col("sub"), col("cell"))
        .agg(array_sort(collect_list(struct(col("dim"), col("mu")))).as("dm"))
        .select(col("sub"), col("cell"), transform(col("dm"), e => e.getField("mu")).as("cv"))
        .as[(Int, Int, Seq[Double])].collect().toSeq
        .map { case (s, c, cv) => ((s, c), cv) }
    }
    val byKey = model.toMap
    // a cell that lost all members keeps its previous centroid absent
    // from `model` — refill from the seed order to keep the codebook
    // total (codes must always have k valid targets)
    val seedFill = byKey.values.head
    Model(m, kEff, subDim, Seq.tabulate(m)(s => Seq.tabulate(kEff)(c =>
      byKey.getOrElse((s, c), seedFill))))
  }

  /** The m-code column for `vec` under `model` (map-side argmax per
    * subspace against literal centroids). */
  private def codesCol(vec: Column, model: Model): Column =
    array((0 until model.m).map { s =>
      val sv = slice(unit(vec), s * model.subDim + 1, model.subDim)
      val best = greatest(model.centroids(s).zipWithIndex.map { case (cv, c) =>
        struct(
          (VectorExpressions.dot(sv, typedlit(cv)) - lit(cv.map(x => x * x).sum / 2)).as("sc"),
          lit(-c).as("nc"))
      }: _*)
      (-best.getField("nc")).cast("int")
    }: _*)

  /** Append `codes array<int>` (length m): per subspace, the cell id
    * of the nearest codebook centroid — pure map-side against the
    * literal model. */
  def encode(corpus: DataFrame, id: Column, vec: Column, model: Model): DataFrame =
    corpus.select(id.as("vec_id"), codesCol(vec, model).as("codes"))

  /** Coarse quantizer for IVFADC: `nCells` full-dimension centroids
    * via the same literal-argmax Lloyd as the subspace training (one
    * mean shuffle per iteration; only the nCells×d model reaches the
    * driver). Seeds = the nCells lowest-id vectors. */
  def trainCoarse(corpus: DataFrame, id: Column, vec: Column,
                  nCells: Int = 16, iters: Int = 1): Seq[Seq[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val v = corpus.select(id.cast("long").as("id"), unit(vec).as("v"))
    var cents: Seq[Seq[Double]] = v.orderBy(col("id")).limit(nCells)
      .select(col("v")).as[Seq[Double]].collect().toSeq
    require(cents.nonEmpty, "PQ.trainCoarse: empty corpus")
    def cellOf(cs: Seq[Seq[Double]]): Column = {
      val best = greatest(cs.zipWithIndex.map { case (cv, c) =>
        struct((VectorExpressions.dot(col("v"), typedlit(cv)) -
          lit(cv.map(x => x * x).sum / 2)).as("sc"), lit(-c).as("nc"))
      }: _*)
      -best.getField("nc")
    }
    for (_ <- 0 until iters) {
      val byCell = v.select(cellOf(cents).as("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim")).agg(avg(col("x")).as("mu"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("dim"), col("mu")))).as("dm"))
        .select(col("cell"), transform(col("dm"), e => e.getField("mu")).as("cv"))
        .as[(Int, Seq[Double])].collect().toMap
      cents = cents.indices.map(c => byCell.getOrElse(c, cents(c)))
    }
    cents
  }

  /** IVFADC search (the full Jégou et al. layout, non-residual
    * variant): every vector carries (cell, codes) — both computed
    * map-side in one pass — and a query ADC-scans ONLY its `nprobe`
    * nearest cells' codes before the exact re-rank. The cell
    * restriction multiplies PQ's 32× memory saving by an
    * nprobe/nCells scan saving; the only shuffles are the per-query
    * rank and the rerank join (cell probing is a broadcast join). */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, id: Column, vec: Column,
                 model: Model, coarse: Seq[Seq[Double]], k: Int,
                 nprobe: Int = 4, rerank: Int = 32): DataFrame = {
    // (vec_id, cell, codes) — one map-side pass over the corpus
    val cellCol = {
      val best = greatest(coarse.zipWithIndex.map { case (cv, c) =>
        struct((VectorExpressions.dot(unit(vec), typedlit(cv)) -
          lit(cv.map(x => x * x).sum / 2)).as("sc"), lit(-c).as("nc"))
      }: _*)
      -best.getField("nc")
    }
    val index = corpus.select(id.as("vec_id"),
      codesCol(vec, model).as("codes"), cellCol.as("cell"))
    // per-query probe list: nprobe nearest coarse cells, map-side
    val cellDots = array(coarse.zipWithIndex.map { case (cv, c) =>
      struct(VectorExpressions.dot(unit(vec), typedlit(cv)).as("d"), lit(c).as("c"))
    }: _*)
    val tbl = array((0 until model.m).map { s =>
      val qs = slice(unit(vec), s * model.subDim + 1, model.subDim)
      array(model.centroids(s).map(cv =>
        VectorExpressions.dot(qs, typedlit(cv))): _*)
    }: _*)
    val q = queries.select(id.as("query_id"), tbl.as("tbl"),
        slice(reverse(array_sort(cellDots)), 1, nprobe).as("probes"))
      .select(col("query_id"), col("tbl"), explode(col("probes")).as("p"))
      .select(col("query_id"), col("tbl"), col("p.c").as("cell"))
    val approx = index.join(broadcast(q), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc", aggregate(
        zip_with(col("codes"), col("tbl"), (c, t) => element_at(t, c + 1)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("arank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("adc").desc, col("vec_id"))))
      .filter(col("arank") <= rerank)
      .select(col("query_id"), col("vec_id"))
    rerankExact(approx, corpus, queries, id, vec, k)
  }

  /** ADC top-k: approximate-cosine scan over codes, exact re-rank of
    * the top `rerank` candidates per query against the full vectors.
    * Returns (query_id, rank, vec_id, cosine) with the EXACT rounded
    * cosine, rank by (cosine desc, vec_id). */
  def adcTopK(encoded: DataFrame, corpus: DataFrame, queries: DataFrame,
              id: Column, vec: Column, model: Model, k: Int,
              rerank: Int = 32): DataFrame = {
    // per-query m×k ADC table: tbl(sub)(cell) = q_sub · centroid
    val tbl = array((0 until model.m).map { s =>
      val qs = slice(unit(vec), s * model.subDim + 1, model.subDim)
      array(model.centroids(s).map(cv =>
        VectorExpressions.dot(qs, typedlit(cv))): _*)
    }: _*)
    val q = queries.select(id.as("query_id"), tbl.as("tbl"))
    val approx = encoded.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc", aggregate(
        zip_with(col("codes"), col("tbl"), (c, t) => element_at(t, c + 1)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("arank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("adc").desc, col("vec_id"))))
      .filter(col("arank") <= rerank)
      .select(col("query_id"), col("vec_id"))
    rerankExact(approx, corpus, queries, id, vec, k)
  }

  /** Exact re-rank: (query_id, vec_id) candidates join back to true
    * vectors (model-sized per query), scores are exact rounded
    * cosine like C6. */
  private def rerankExact(candidates: DataFrame, corpus: DataFrame,
                          queries: DataFrame, id: Column, vec: Column,
                          k: Int): DataFrame = {
    val full = corpus.select(id.as("vec_id"), vec.cast("array<double>").as("v"))
      .withColumn("nrm", VectorExpressions.norm(col("v")))
    val qfull = queries.select(id.as("query_id"), vec.cast("array<double>").as("qv"))
      .withColumn("qn", VectorExpressions.norm(col("qv")))
    candidates
      .join(full, "vec_id")
      .join(broadcast(qfull), "query_id")
      .withColumn("cosine",
        round(VectorExpressions.dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
  }
}
