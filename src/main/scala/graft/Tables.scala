package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry/loader for the graft engine (SURVEY §E1).
  *
  * Loads the synthetic star-schema + document/embedding tables from a
  * scale-factor directory. At cluster scale the same API fronts a
  * partitioned data lake: `load` is a plain parquet scan, so Catalyst
  * column pruning and predicate pushdown apply to everything built on
  * top of it.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has shipped in TWO physical forms across testdata
    // generations: parquet TIMESTAMP(NANOS) (which Spark's reader
    // rejects natively — read as long nanos via the legacy knob) and
    // plain TIMESTAMP(MICROS)/_NTZ. The loader adapts to whatever the
    // file stores, so the engine's `ts` is always a session
    // TimestampType — E16's schema-drift tolerance applied to the
    // registry's own tables.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") eventsFromRaw(df) else df
  }

  /** Raw `events` (ts in its STORED type — nanos long for legacy
    * TIMESTAMP(NANOS) files, timestamp[_ntz] for current ones) — for
    * pushdown-sensitive event-time filters: a predicate built in the
    * stored type reaches the parquet scan (and prunes row groups /
    * partitions), which a predicate on a CONVERTED column never does
    * (it's a computed column to Catalyst). */
  def loadEventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  /** Nanos-since-epoch of a UTC 'yyyy-MM-dd HH:mm:ss' literal —
    * the raw-domain image of a timestamp cutoff for nanos-long
    * columns. Exact for whole seconds, so raw >= tsNanos(c) ⟺
    * converted ts >= c. */
  def tsNanos(ts: String): Long =
    java.time.LocalDateTime.parse(ts.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L

  /** A cutoff literal in the STORED type of `df`'s time column, so
    * the comparison stays on the stored column and is pushed to the
    * scan whichever physical form the file uses: long nanos for
    * legacy TIMESTAMP(NANOS) reads, TIMESTAMP_NTZ for ntz columns,
    * session timestamp otherwise. `ts` is 'yyyy-MM-dd HH:mm:ss[.S]'
    * interpreted as UTC (the session zone of record). */
  def storedTsLit(df: DataFrame, colName: String, ts: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema(colName).dataType match {
      case LongType         => lit(tsNanos(ts))
      case TimestampNTZType => lit(ts).cast(TimestampNTZType)
      case _                => lit(ts).cast("timestamp")
    }
  }

  /** Standard shape from raw events: ts as a session TimestampType,
    * whatever the stored form — nanos longs truncate to micros
    * (exactly what DuckDB/Arrow do when narrowing ns → µs), ntz
    * reinterprets its wall clock in the session zone (UTC here, so
    * values are identical to the legacy conversion). */
  def eventsFromRaw(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  }

  /** Load any supported lake format with an optional explicit schema
    * (csv/json need one for stable types; parquet carries its own). */
  def loadFormat(spark: SparkSession, path: String, format: String,
                 schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    val withSchema = schema.fold(if (format == "csv") r.option("inferSchema", "true") else r)(r.schema)
    (if (format == "csv") withSchema.option("header", "true") else withSchema).load(path)
  }

  /** Register every table as a temp view (for spark.sql users). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Schema-drift-tolerant union load (SURVEY E16): one DataFrame
    * over CORPUS GENERATIONS whose schemas drifted — later crawls add
    * columns (a quality score, a license tag), early ones lack them.
    * Parquet's own mergeSchema handles ADDED columns only when types
    * agree; this also reconciles a column that changed NUMERIC WIDTH
    * across generations (int → long, float → double) by widening
    * every generation to the common type before `unionByName` with
    * missing-column nulls. Incompatible changes (string → int) fail
    * loudly rather than silently coercing.
    *
    * Scale: each generation stays its own parquet scan (pruning and
    * pushdown intact per source); the union is plan-level, not a
    * shuffle. */
  def loadGenerations(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "loadGenerations: need at least one path")
    import org.apache.spark.sql.types._
    val frames = paths.map(p => spark.read.parquet(p))
    def isInt(t: DataType): Boolean =
      t == ByteType || t == ShortType || t == IntegerType || t == LongType
    def isFloat(t: DataType): Boolean = t == FloatType || t == DoubleType
    def widen(a: DataType, b: DataType): DataType = (a, b) match {
      case (x, y) if x == y => x
      case (x, y) if isInt(x) && isInt(y) =>
        if (x.defaultSize >= y.defaultSize) x else y
      case (x, y) if isInt(x) && isFloat(y) => y
      case (x, y) if isFloat(x) && isInt(y) => x
      case (x, y) if isFloat(x) && isFloat(y) =>
        if (x.defaultSize >= y.defaultSize) x else y
      // decimal width drift (DECIMAL(10,2) vs DECIMAL(18,4)) widens to
      // a type holding both: max integral digits + max scale, capped
      // at Spark's 38-digit maximum
      case (x: DecimalType, y: DecimalType) =>
        val scale = math.max(x.scale, y.scale)
        val intDigits = math.max(x.precision - x.scale, y.precision - y.scale)
        DecimalType(math.min(DecimalType.MAX_PRECISION, intDigits + scale), scale)
      case (x, y) => throw new IllegalArgumentException(
        s"loadGenerations: incompatible drift for a column: $x vs $y")
    }
    val merged: Map[String, DataType] = frames.flatMap(_.schema.fields)
      .groupBy(_.name).map { case (n, fs) =>
        n -> fs.map(_.dataType).reduce(widen)
      }
    // FIRST-SEEN column order — the first generation's declared order,
    // then columns newly added by later generations in discovery
    // order. Alphabetical re-sorting surprises positional readers and
    // writers of the unioned frame.
    val ordered = frames.foldLeft(Vector.empty[String]) { (acc, f) =>
      acc ++ f.schema.fieldNames.filterNot(acc.contains)
    }
    val aligned = frames.map { f =>
      val cols = f.schema.fieldNames.toSet
      f.select(ordered.map { n =>
        if (cols(n)) org.apache.spark.sql.functions.col(n).cast(merged(n))
        else org.apache.spark.sql.functions.lit(null).cast(merged(n)).as(n)
      }: _*)
    }
    aligned.reduce(_ unionByName _)
  }

  private def jdbcProps(props: Map[String, String]): java.util.Properties = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** JDBC source — the reference's persistence layer is a SQL
    * database read row-at-a-time (pasta-pipeline
    * `dags/processors/telegraph_processor.py:82-88`); here the same
    * table arrives as a DataFrame with Catalyst pushing filters and
    * column pruning into the generated SQL (the scan shows
    * `PushedFilters`), so only the needed rows/columns cross the
    * wire. Single connection — for big tables use the partitioned
    * overload. */
  def loadJdbc(spark: SparkSession, url: String, table: String,
               props: Map[String, String] = Map()): DataFrame =
    spark.read.jdbc(url, table, jdbcProps(props))

  /** Partitioned JDBC read: `numPartitions` parallel range queries on
    * `partitionCol` (one executor task each, WHERE-clause ranges over
    * [lower, upper]) — the scale path for ingesting a large table
    * without funnelling it through one connection. */
  def loadJdbc(spark: SparkSession, url: String, table: String,
               partitionCol: String, lower: Long, upper: Long, numPartitions: Int,
               props: Map[String, String]): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions,
      jdbcProps(props))
}
