package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Parquet sink helpers (SURVEY E4): the write-side of the scale
  * design in SURVEY §5.
  *
  * - `writePartitioned`: hive-style directory partitioning, so readers
  *   get PARTITION PRUNING on the partition columns for free (a date
  *   or date-derived column in almost every pipeline — the reference's
  *   retention/incremental modes (dag.py:137-148) become directory
  *   drops/scans instead of full-table filters).
  * - `writeBucketed`: persistent bucketing on a join/dedup key; two
  *   tables bucketed the same way join WITHOUT a shuffle, which is the
  *   difference between hours and minutes for the repeated
  *   upsert/dedup cycles the reference runs weekly.
  * - `maxRecordsPerFile` guards against the giant-file long tail.
  */
object Sink {

  /** Partitioned parquet write. `maxRecordsPerFile` 0 = unlimited. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite,
                       maxRecordsPerFile: Long = 0L): Unit =
    df.write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Derive a date partition column from a timestamp and write
    * partitioned by it (the standard event-lake layout). */
  def writeByDate(df: DataFrame, path: String, tsCol: String,
                  mode: SaveMode = SaveMode.Overwrite): Unit =
    writePartitioned(df.withColumn("dt", to_date(col(tsCol)).cast("string")),
      path, Seq("dt"), mode)

  /** CSV export (the reference's scraper output format,
    * message_scraper.py:120-124): header on, standard quoting. */
  def writeCsv(df: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  /** ORC export (the other columnar lake format Spark ships). */
  def writeOrc(df: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** JSON-lines export (message_scraper.py:127-129). */
  def writeJson(df: DataFrame, path: String,
                mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** JDBC sink — the reference's batched upsert loader
    * (db_loader.py:117-181 collects rows into batches and
    * execute_values them): each Spark task writes its partition over
    * one connection in `batchSize`d prepared-statement batches.
    * INSERT-only (the JDBC datasource has no MERGE) — for the
    * reference's ON CONFLICT semantics, merge in the lake first
    * (`Upsert.merge`/`mergeWritePartitioned`) and load the merged
    * result, or stage into a temp table and MERGE database-side. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: SaveMode = SaveMode.Append, batchSize: Int = 1000,
                props: Map[String, String] = Map()): Unit = {
    val p = new java.util.Properties()
    p.setProperty("batchsize", batchSize.toString)
    props.foreach { case (k, v) => p.setProperty(k, v) }
    df.write.mode(mode).jdbc(url, table, p)
  }

  /** Bucketed + sorted managed table (bucketing requires the table
    * catalog): co-locates rows by `bucketCol` so equi-joins and
    * per-key dedup on it are exchange-free. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Order-preserving numeric key for a z-order column. Numerics cast
    * to double; STRINGS map to the big-endian value of their first 7
    * UTF-8 bytes, zero-padded to fixed width (rpad of the hex — a
    * binary rpad does not exist): fixed width is what makes shorter
    * strings compare correctly ("z" vs "abc" — without padding the
    * longer string always wins numerically), and UTF-8's design makes
    * byte order equal code-point order. 7 bytes keeps the value in 56
    * bits (positive long). Strings sharing a 7-byte prefix share a
    * key — they cluster together, which is exactly what a layout
    * decision wants; the residual filter stays exact regardless. */
  private def orderKey(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.StringType =>
        conv(rpad(hex(substring(c.cast("binary"), 1, 7)), 14, "0"), 16, 10)
          .cast("long").cast("double")
      case _ => c.cast("double")
    }

  /** Z-order (Morton) value over numeric OR STRING columns, each
    * first normalized into `bits` buckets by its observed min/max
    * (one tiny driver-side agg — the same layout decision
    * Delta/Iceberg OPTIMIZE ZORDER makes at write time). Bit
    * interleaving is plain shift/and/or Catalyst expressions — fully
    * codegen'd. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.size >= 2, "z-order needs at least two columns")
    require(bits * cols.size <= 62, "z-value must fit a long")
    def key(c: String): Column = orderKey(col(c), df.schema(c).dataType)
    val aggs = cols.flatMap(c => Seq(min(key(c)).as(s"mn_$c"),
      max(key(c)).as(s"mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val maxBucket = (1L << bits) - 1
    val bucketed = cols.zipWithIndex.map { case (c, i) =>
      val mn = stats.getDouble(2 * i)
      val mx = stats.getDouble(2 * i + 1)
      val span = math.max(mx - mn, 1e-12)
      least(greatest(((key(c) - mn) / span * maxBucket).cast("long"),
        lit(0L)), lit(maxBucket))
    }
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      bucketed.zipWithIndex.foldLeft(acc) { case (a, (bc, i)) =>
        a.bitwiseOR(shiftleft(shiftright(bc, b).bitwiseAND(lit(1L)), b * cols.size + i))
      }
    }
  }

  /** Write `df` clustered along a Z-curve over `zcols` (SURVEY E12):
    * range-repartition + sort by the z-value, so every output file
    * covers a small rectangle in ALL `zcols` dimensions at once —
    * parquet min/max row-group stats then skip files for predicates
    * on ANY of the columns, where a linear sort only helps its
    * leading column. The z column never reaches the files. */
  def writeZOrdered(df: DataFrame, path: String, zcols: Seq[String],
                    nFiles: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
    df.withColumn("__z", zValue(df, zcols))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(mode).parquet(path)
  }
}
