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

  /** Publish a trained quality-classifier model (C52): the (tok, w)
    * log-odds table plus ONE tok-NULL row carrying the prior (no
    * real token is null — `Classifier.toks` filters them), so the
    * whole model is a single engine-portable parquet table under the
    * same marker-committed snapshot discipline as the codebooks.
    * This is what makes the D15 ingest gate restartable: train
    * offline, publish, and every gate restart reloads the exact
    * frozen model (parquet doubles round-trip bit-for-bit). */
  def saveClassifier(spark: SparkSession, model: graft.operators.Classifier.Model,
                     path: String, keep: Int = 1): Long = {
    val rows = model.table.select(col("tok"), col("w"))
      .unionByName(spark.range(1)
        .select(lit(null).cast("string").as("tok"), lit(model.prior).as("w")))
    // vocab-sized (seed vocabulary — MBs, not corpus-scale): one file
    write(spark, rows.repartition(1), path, keep)
  }

  /** Load the current classifier snapshot; the table stays a lazy
    * scan of the snapshot (broadcast at scoring time), only the
    * prior row is read eagerly. */
  def loadClassifier(spark: SparkSession, path: String): graft.operators.Classifier.Model = {
    val t = Versioned.read(spark, path)
      .select(col("tok"), col("w").cast("double"))
    val priorRows = t.filter(col("tok").isNull).select(col("w")).collect()
    require(priorRows.length == 1,
      s"Models.loadClassifier: expected exactly one prior row at $path, " +
        s"got ${priorRows.length} — corrupt model table")
    graft.operators.Classifier.Model(t.filter(col("tok").isNotNull), priorRows(0).getDouble(0))
  }

  private def write(spark: SparkSession, df: org.apache.spark.sql.DataFrame,
                    path: String, keep: Int): Long =
    Versioned.write(df, path, keep)
}
