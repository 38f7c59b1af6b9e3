package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.PQ

/** Persistent ANN model store (SURVEY E14).
  *
  * At corpus scale, training a quantizer, encoding the corpus, and
  * serving queries are SEPARATE JOBS on separate schedules: the
  * codebook is trained rarely (it is a sample statistic — k·d
  * doubles), the index is encoded incrementally as batches arrive,
  * and query jobs only ever READ the model. That split needs the
  * model on storage, not in a driver's memory.
  *
  * Layout: one parquet table per model, `(sub, cell, centroid)` rows
  * — engine-portable (any SQL engine can read a codebook), schema-
  * checked on load, and exact: parquet doubles round-trip bit-for-bit,
  * so a loaded model encodes IDENTICALLY to the trained one (specs
  * pin this). A coarse IVF codebook is the m = 1 special case of the
  * same table — one format for every quantizer in the family
  * (C5 cells / C16 IVF / C27 PQ / C31 IVFADC).
  *
  * Publish goes through `Versioned` (E13): a model REFRESH (drift
  * retrain) is a new snapshot directory committed by marker, so query
  * jobs mid-read keep a complete old model and never see a partial
  * codebook; `keep` old snapshots lets an encode job that resolved
  * the model before the refresh finish consistently. Dead cells
  * (empty centroid seq — a Lloyd cell that lost every member) are
  * stored as empty arrays and survive the round trip.
  */
object Models {

  /** Publish a PQ model as the next snapshot of `path`. */
  def savePQ(spark: SparkSession, model: PQ.Model, path: String, keep: Int = 1): Long = {
    import spark.implicits._
    val rows = for {
      (cells, s) <- model.centroids.zipWithIndex
      (cv, c) <- cells.zipWithIndex
    } yield (s, c, cv)
    // repartition(1): a codebook is k·d doubles — one file reads in
    // one task; default parallelism would scatter 128 tiny files
    write(spark, rows.toDF("sub", "cell", "centroid").repartition(1), path, keep)
  }

  /** Load the current snapshot of a PQ model. */
  def loadPQ(spark: SparkSession, path: String): PQ.Model = {
    import spark.implicits._
    val rows = Versioned.read(spark, path)
      .select(col("sub").cast("int"), col("cell").cast("int"),
        col("centroid").cast("array<double>"))
      .as[(Int, Int, Seq[Double])].collect()
    require(rows.nonEmpty, s"Models.loadPQ: empty model table at $path")
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val byKey = rows.map { case (s, c, cv) => ((s, c), cv) }.toMap
    val cents = Seq.tabulate(m)(s => Seq.tabulate(k)(c =>
      byKey.getOrElse((s, c),
        sys.error(s"Models.loadPQ: $path missing (sub=$s, cell=$c) — corrupt model table"))))
    val subDim = cents.iterator.flatten.find(_.nonEmpty)
      .getOrElse(sys.error(s"Models.loadPQ: all cells dead at $path")).length
    PQ.Model(m, k, subDim, cents)
  }

  /** Publish a coarse (IVF / angular-cell) codebook: the m = 1 case. */
  def saveCoarse(spark: SparkSession, cents: Seq[Seq[Double]], path: String,
                 keep: Int = 1): Long =
    savePQ(spark, PQ.Model(1, cents.length,
      cents.find(_.nonEmpty).map(_.length).getOrElse(0), Seq(cents)), path, keep)

  /** Load the current coarse codebook. */
  def loadCoarse(spark: SparkSession, path: String): Seq[Seq[Double]] =
    loadPQ(spark, path).centroids.head

  private def write(spark: SparkSession, df: org.apache.spark.sql.DataFrame,
                    path: String, keep: Int): Long =
    Versioned.write(df, path, keep)
}
