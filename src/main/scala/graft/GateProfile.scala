package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: where does a D10 gate arrival's time go? Builds a
  * persistent-store fixture (STORE_BATCHES × BATCH docs, disjoint
  * vocabularies — the StreamBench construction), writes it to
  * parquet like the streaming store, then times ONE gate arrival
  * against it, reporting the executed join operators and the task
  * shuffle totals. The question under test: does the store get
  * SHUFFLED (O(store) network per arrival) or only SCANNED?
  * GATE_EXPLAIN=1 prints the full plan.
  *
  * `GATE_MODE=ladder` instead profiles ONE D16 composed-ladder
  * arrival stage by stage — the foreachBatch body of
  * `EventStream.ingestPipelineSink` reproduced inline with a timer
  * and task-metric deltas around each ACTION (the sink's own action
  * structure: score-gated pin, decon pin, near-dup gate, corpus
  * write, signature writes) — answering where a composed arrival's
  * time goes when the stage sum and the ladder total disagree. */
object GateProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batchSize = sys.env.getOrElse("GATE_BATCH", "2000").toInt
    val storeBatches = sys.env.getOrElse("GATE_STORE_BATCHES", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // dead-localCheckpoint-block disk guard (see Bench's builder)
      .config("spark.cleaner.periodicGC.interval", "60s")
      // keep executed scans visible in the final plan tree: AQE's
      // empty-relation propagation replaces an already-run stage
      // (scan included) with EmptyRelation, which would hide the
      // store-scan metrics this profiler exists to report. The rule
      // only skips post-scan work on empty branches, so excluding it
      // does not change what the scan itself costs.
      .config("spark.sql.adaptive.optimizer.excludedRules",
        "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sources.Indexed.configureSession(spark) // wide pushdown chunks for the store probes
    import spark.implicits._

    if (sys.env.get("GATE_MODE").contains("ladder")) {
      ladder(spark, sfDir, batchSize, storeBatches); spark.stop(); return
    }
    if (sys.env.get("GATE_MODE").contains("sink")) {
      sink(spark, sfDir, batchSize, storeBatches); spark.stop(); return
    }

    // store dirs can be built coarser than the arrival batch
    // (GATE_STORE_BATCH) so multi-million-doc stores don't need
    // hundreds of signature jobs; compaction consolidates them anyway
    val storeBatchSize = sys.env.getOrElse("GATE_STORE_BATCH", batchSize.toString).toInt

    val pool = Tables.load(spark, sfDir, "documents")
      .select(col("text")).as[String].collect()
    def docsN(tag: String, k: Int, n: Int) =
      (0 until n).map { i =>
        val pfx = s"$tag${k}·"
        (k.toLong * n + i,
          pool((k * n + i) % pool.length)
            .split("\\s+").filter(_.nonEmpty).map(pfx + _).mkString(" "))
      }.toDF("id", "text")
    def docs(tag: String, k: Int) = docsN(tag, k, batchSize)

    // GATE_OVERLAP=f: fraction of each ARRIVAL batch duplicating
    // store dir 0's docs (same text, fresh ids) — near-dup hits, so
    // the probe's match path (bloom hits → manifest file selection →
    // point page reads → verify joins) is exercised, not just the
    // all-miss fast path the disjoint fixture produces
    val overlap = sys.env.getOrElse("GATE_OVERLAP", "0").toDouble
    def arrival(tag: String, k: Int) = {
      val nDup = (batchSize * overlap).toInt
      val dup = (0 until nDup).map { i =>
        (900000000L + k.toLong * batchSize + i,
          pool(i % pool.length)
            .split("\\s+").filter(_.nonEmpty).map("s0·" + _).mkString(" "))
      }
      val fresh = (nDup until batchSize).map { i =>
        val pfx = s"$tag${k}·"
        (k.toLong * batchSize + i,
          pool((k * batchSize + i) % pool.length)
            .split("\\s+").filter(_.nonEmpty).map(pfx + _).mkString(" "))
      }
      (dup ++ fresh).toDF("id", "text")
    }

    // GATE_INDEXED=1: the Indexed store layout (sorted batch files +
    // sidecars, as the sinks now write) and the pruned gate path;
    // GATE_COMPACTED=1 additionally consolidates the batch dirs the
    // way nearDupStoreCompact would (global clustering — the layout a
    // long-running store converges to)
    val indexed = sys.env.get("GATE_INDEXED").contains("1")
    val compacted = sys.env.get("GATE_COMPACTED").contains("1")
    val dir = java.nio.file.Files.createTempDirectory("graft-gateprof").toString
    val storeDocs = storeBatches.toLong * batchSize
    val storeDirs = math.max(1, (storeDocs / storeBatchSize).toInt)
    (0 until storeDirs).foreach { k =>
      val (b, s) = operators.Incremental.signatures(
        docsN("s", k, storeBatchSize), col("id"), col("text"))
      if (indexed) {
        sources.Indexed.writeSmall(b, s"$dir/bands/batch=$k", "bk")
        sources.Indexed.writeSmall(s, s"$dir/sets/batch=$k", "id", pageRows = 128)
      } else {
        b.write.mode("overwrite").parquet(s"$dir/bands/batch=$k")
        s.write.mode("overwrite").parquet(s"$dir/sets/batch=$k")
      }
    }
    if (compacted)
      graft.streaming.EventStream.nearDupStoreCompact(spark, dir, storeBatches.toLong)
    val storeBands = spark.read.parquet(s"$dir/bands")
    val storeSets = spark.read.parquet(s"$dir/sets")
    println(s"store: ${storeBands.count()} band rows, ${storeSets.count()} set rows")

    val shufW = new LongAdder; val shufR = new LongAdder; val inBytes = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufW.add(m.shuffleWriteMetrics.bytesWritten)
          shufR.add(m.shuffleReadMetrics.totalBytesRead)
          inBytes.add(m.inputMetrics.bytesRead)
        }
      }
    })

    // input-bytes task metrics only see the Hadoop-FS stream (parquet
    // data pages on local disk bypass it), so measure the store scan
    // directly: rows/files emitted by every FileSourceScanExec over
    // the store dirs, summed across the arrival's query executions
    val bandRowsScanned = new LongAdder; val bandFilesRead = new LongAdder
    val setRowsScanned = new LongAdder; val setFilesRead = new LongAdder
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      private def walk(p: SparkPlan): Unit = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case s: FileSourceScanExec =>
          val roots = s.relation.location.rootPaths.map(_.toString)
          val (rows, files) =
            (s.metrics("numOutputRows").value, s.metrics("numFiles").value)
          if (sys.env.contains("GATE_DEBUG"))
            println(s"QEL scan: rows=$rows files=$files roots=${roots.take(2)}")
          if (roots.exists(_.contains("/bands"))) {
            bandRowsScanned.add(rows); bandFilesRead.add(files)
          } else if (roots.exists(_.contains("/sets"))) {
            setRowsScanned.add(rows); setFilesRead.add(files)
          }
        case o =>
          if (sys.env.contains("GATE_DEBUG"))
            println(s"QEL node: ${o.getClass.getSimpleName} children=${o.children.size}")
          o.children.foreach(walk)
      }
      override def onSuccess(name: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        if (sys.env.contains("GATE_DEBUG"))
          println(s"QEL onSuccess: $name ${qe.executedPlan.getClass.getSimpleName}\n" +
            qe.executedPlan.toString.linesIterator.map("QELP " + _).mkString("\n"))
        walk(qe.executedPlan)
      }
      override def onFailure(name: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    })

    val pb: Option[Seq[Any] => Option[org.apache.spark.sql.DataFrame]] =
      if (indexed) Some(keys => sources.Indexed.prunedRead(spark, s"$dir/bands", "bk", keys))
      else None
    val ps: Option[Seq[Any] => Option[org.apache.spark.sql.DataFrame]] =
      if (indexed) Some(keys => sources.Indexed.prunedRead(spark, s"$dir/sets", "id", keys))
      else None

    // warm: one gate arrival end-to-end (codegen etc.)
    val warm = operators.Incremental.gate(storeBands, storeSets,
      arrival("w", 990), col("id"), col("text"),
      prunedBands = pb, prunedSets = ps)._1
    warm.write.format("noop").mode("overwrite").save()

    org.apache.spark.graft.Listeners.settle(spark.sparkContext)
    shufW.reset(); shufR.reset(); inBytes.reset()
    bandRowsScanned.reset(); bandFilesRead.reset()
    setRowsScanned.reset(); setFilesRead.reset()
    val t0 = System.nanoTime()
    val (surv, _, _) = operators.Incremental.gate(storeBands, storeSets,
      arrival("m", 991), col("id"), col("text"),
      prunedBands = pb, prunedSets = ps)
    surv.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.Listeners.settle(spark.sparkContext)

    val plan = surv.queryExecution.executedPlan.toString
    val joins = plan.linesIterator.map(_.trim)
      .filter(l => l.contains("Join") || l.contains("Exchange"))
      .map(_.takeWhile(_ != '(')).toSeq
        .groupBy(identity).view.mapValues(_.size).toSeq.sortBy(-_._2)
    println(f"gate arrival: $sec%.2f s  input=${inBytes.sum / 1e6}%.1f MB " +
      f"shuffle_write=${shufW.sum / 1e6}%.1f MB shuffle_read=${shufR.sum / 1e6}%.1f MB")
    println(s"store scan: bands ${bandRowsScanned.sum} rows / ${bandFilesRead.sum} files, " +
      s"sets ${setRowsScanned.sum} rows / ${setFilesRead.sum} files")
    println("plan operators: " + joins.map { case (k, n) => s"$n×$k" }.mkString(", "))
    if (sys.env.contains("GATE_EXPLAIN")) println(plan)
    spark.stop()
  }

  /** One D10 sink arrival — `nearDupGateSink`'s foreachBatch body
    * inline with a timer around each ACTION, answering where the
    * per-arrival seconds go when StreamBench's end-to-end medians
    * move. GATE_INDEXED=1 = the sinks' real shape (indexed store
    * writes + pruned gate); 0 = the round-9 shape (plain parquet
    * writes, scan-plan gate). */
  private def sink(spark: SparkSession, sfDir: String,
                   batchSize: Int, storeBatches: Int): Unit = {
    import spark.implicits._
    import graft.streaming.EventStream
    val indexed = sys.env.get("GATE_INDEXED").contains("1")

    val pool = Tables.load(spark, sfDir, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def docsDF(tag: String, k: Int) =
      (0 until batchSize).map { i =>
        val (lang, text) = pool((k * batchSize + i) % pool.length)
        val pfx = s"$tag${k}·"
        (k.toLong * batchSize + i, lang,
          text.split("\\s+").filter(_.nonEmpty).map(pfx + _).mkString(" "))
      }.toDF("doc_id", "lang", "text")

    val dir = java.nio.file.Files.createTempDirectory("graft-sinkprof").toString
    (0 until storeBatches).foreach { k =>
      val (b, s) = operators.Incremental.signatures(
        docsDF("s", k), col("doc_id"), col("text"))
      if (indexed) {
        sources.Indexed.writeSmall(b, s"$dir/store/bands/batch=$k", "bk")
        sources.Indexed.writeSmall(s, s"$dir/store/sets/batch=$k", "id",
          pageRows = 128)
      } else {
        b.write.mode("overwrite").parquet(s"$dir/store/bands/batch=$k")
        s.write.mode("overwrite").parquet(s"$dir/store/sets/batch=$k")
      }
    }

    def stage[T](name: String, measured: Boolean)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      if (measured)
        println(f"  $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    Seq(("w", storeBatches), ("m", storeBatches + 1)).foreach { case (tag, k) =>
      val measured = tag == "m"
      if (measured)
        println(s"sink arrival (indexed=$indexed): batch=$batchSize " +
          s"store=$storeBatches×$batchSize")
      def st[T](name: String)(body: => T): T = stage(name, measured)(body)
      val batchId = k.toLong
      val t0 = System.nanoTime()
      val b = docsDF(tag, k).repartition(spark.sparkContext.defaultParallelism)
      val (storeBands, storeSets) = (
        spark.read.parquet(s"$dir/store/bands"),
        spark.read.parquet(s"$dir/store/sets"))
      val pb: Option[Seq[Any] => Option[org.apache.spark.sql.DataFrame]] =
        if (indexed)
          Some(keys => sources.Indexed.prunedRead(spark, s"$dir/store/bands", "bk", keys))
        else None
      val ps: Option[Seq[Any] => Option[org.apache.spark.sql.DataFrame]] =
        if (indexed)
          Some(keys => sources.Indexed.prunedRead(spark, s"$dir/store/sets", "id", keys))
        else None
      var gated: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = null
      st("gate construct") {
        gated = operators.Incremental.gate(storeBands, storeSets, b,
          col("doc_id"), col("text"), prunedBands = pb, prunedSets = ps)
      }
      val (surv, bBands, bSets) = gated
      val survDocs = b.join(
        surv.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_semi")
      val nonEmpty = st("survDocs isEmpty") { !survDocs.isEmpty }
      st("corpus write") {
        if (nonEmpty)
          EventStream.appendBatchWrite(survDocs, batchId, s"$dir/corpus", "lang")
      }
      st("band sig write") {
        if (indexed)
          sources.Indexed.writeSmall(bBands, s"$dir/store/bands/batch=$batchId", "bk")
        else bBands.write.mode("overwrite").parquet(s"$dir/store/bands/batch=$batchId")
      }
      st("set sig write") {
        if (indexed)
          sources.Indexed.writeSmall(bSets, s"$dir/store/sets/batch=$batchId", "id",
            pageRows = 128)
        else bSets.write.mode("overwrite").parquet(s"$dir/store/sets/batch=$batchId")
      }
      if (measured)
        println(f"  TOTAL                  ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
  }

  /** One composed-ladder arrival, the ingestPipelineSink foreachBatch
    * body inline, a timer + task-metric delta around each action. */
  private def ladder(spark: SparkSession, sfDir: String,
                     batchSize: Int, storeBatches: Int): Unit = {
    import graft.streaming.EventStream

    val pool = Tables.load(spark, sfDir, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def docs(tag: String, k: Int) =
      (0 until batchSize).map { i =>
        val (lang, text) = pool((k * batchSize + i) % pool.length)
        val pfx = s"$tag${k}·"
        (k.toLong * batchSize + i, lang,
          text.split("\\s+").filter(_.nonEmpty).map(pfx + _).mkString(" "))
      }
    def docsDF(tag: String, k: Int) = {
      import spark.implicits._
      docs(tag, k).toDF("doc_id", "lang", "text")
    }

    // frozen models, StreamBench's construction (excluded from timers)
    val docsT = Tables.load(spark, sfDir, "documents")
    val evalGrams = operators.Contamination.evalGramSet(
        docsT.filter(col("doc_id") % 100 === 0), col("doc_id"),
        lower(col("text")), 3)
      .localCheckpoint(true)
    val dsir0 = operators.Dsir.train(
      docsT.filter(col("lang") === "en"), docsT, col("doc_id"), lower(col("text")))
    val dsirModel = dsir0.copy(table = dsir0.table.localCheckpoint(true))
    val clf0 = operators.Classifier.train(
      docsT.filter(col("doc_id") % 10 === 1), docsT.filter(col("doc_id") % 10 === 2),
      col("doc_id"), col("text"))
    val clfModel = clf0.copy(table = clf0.table.localCheckpoint(true))
    val lm0 = operators.LangModel.train(docsT, lower(col("text")))
    val lmModel = lm0.copy(table = lm0.table.localCheckpoint(true))

    val dir = java.nio.file.Files.createTempDirectory("graft-ladderprof").toString
    (0 until storeBatches).foreach { k =>
      val (b, s) = operators.Incremental.signatures(
        docsDF("s", k), col("doc_id"), col("text"))
      b.write.mode("overwrite").parquet(s"$dir/store/bands/batch=$k")
      s.write.mode("overwrite").parquet(s"$dir/store/sets/batch=$k")
    }

    val shufW = new LongAdder; val shufR = new LongAdder; val inBytes = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufW.add(m.shuffleWriteMetrics.bytesWritten)
          shufR.add(m.shuffleReadMetrics.totalBytesRead)
          inBytes.add(m.inputMetrics.bytesRead)
        }
      }
    })
    // measured-stage samples, dumped as JSON at the end: a per-stage
    // attribution a SURVEY table cites must trace to a committed
    // record, not stderr prose (VERDICT r13 item 2)
    val stageRows = scala.collection.mutable.ArrayBuffer
      .empty[(String, Double, Double, Double, Double)]
    def stage[T](name: String)(body: => T): T = {
      shufW.reset(); shufR.reset(); inBytes.reset()
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"  $name%-22s $sec%6.2f s  input=${inBytes.sum / 1e6}%8.1f MB " +
        f"shuffle_w=${shufW.sum / 1e6}%7.1f MB shuffle_r=${shufR.sum / 1e6}%7.1f MB")
      stageRows += ((name, sec, inBytes.sum / 1e6, shufW.sum / 1e6, shufR.sum / 1e6))
      r
    }

    // one warmup arrival end-to-end (codegen, sink setup), then the
    // measured arrival — both the full foreachBatch body
    Seq(("w", storeBatches), ("m", storeBatches + 1)).foreach { case (tag, k) =>
      val measured = tag == "m"
      if (measured) println(s"ladder arrival: batch=$batchSize store=$storeBatches×$batchSize")
      def st[T](name: String)(body: => T): T =
        if (measured) stage(name)(body) else body
      val batchId = k.toLong
      // the sink's exact shape: spread → quality+scrub → PIN (the
      // pin stops predicate pushdown re-inlining the scrub regexes
      // into every kernel filter), then kernels + decon → final pin
      // TOTAL starts BEFORE the first stage — it used to start after
      // the quality pin, silently excluding that stage from the
      // stage-sum-vs-total comparison this profiler exists to make
      val t0 = System.nanoTime()
      var batch: org.apache.spark.sql.DataFrame = null
      st("quality+scrub pin") {
        batch = EventStream.qualityGate(
          docsDF(tag, k).repartition(spark.sparkContext.defaultParallelism),
          col("text"), -1e9).localCheckpoint(true)
      }
      val scrubbedText = col("scrubbed")
      var surv = batch
        .filter(operators.LangModel.scoreCol(scrubbedText, lmModel)
          .getField("lm_score") <= 1e9)
        .filter(operators.Classifier.scoreCol(scrubbedText, clfModel)
          .getField("logodds") > -1e9)
        .filter(operators.Dsir.scoreCol(scrubbedText, dsirModel)
          .getField("logw") >= -1000.0)
      st("kernels+decon + pin") {
        surv = surv.join(
          operators.Contamination
            .sharedGramsVs(surv, evalGrams, col("doc_id"), scrubbedText, 3)
            .filter(col("shared_grams") > 0L)
            .select(col("id").as("doc_id")),
          Seq("doc_id"), "left_anti")
          .localCheckpoint(true)
      }
      val storeBands = spark.read.parquet(s"$dir/store/bands")
      val storeSets = spark.read.parquet(s"$dir/store/sets")
      // the gate call itself is lazy — its cost lands in whichever
      // action below first consumes `ids`, exactly like the sink
      val (ids, bBands, bSets) = operators.Incremental.gate(
        storeBands, storeSets, surv, col("doc_id"), scrubbedText)
      val survDocs = surv.join(
        ids.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_semi")
      val nonEmpty = st("survDocs isEmpty") { !survDocs.isEmpty }
      st("corpus write") {
        if (nonEmpty)
          EventStream.appendBatchWrite(survDocs, batchId, s"$dir/corpus", "lang")
      }
      st("signature writes") {
        bBands.write.mode("overwrite").parquet(s"$dir/store/bands/batch=$batchId")
        bSets.write.mode("overwrite").parquet(s"$dir/store/sets/batch=$batchId")
      }
      if (measured) {
        val total = (System.nanoTime() - t0) / 1e9
        println(f"  TOTAL                  $total%6.2f s")
        // committed-record twin of the stdout table (GATE_PROF_OUT)
        def j(v: Double): String =
          String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
        val rows = stageRows.map { case (n, sec, in, w, r) =>
          s""""$n":{"sec":${j(sec)},"input_mb":${j(in)},""" +
            s""""shuffle_write_mb":${j(w)},"shuffle_read_mb":${j(r)}}"""
        }.mkString(",")
        val out = sys.env.getOrElse("GATE_PROF_OUT", "gateprofile_out.json")
        val line = s"""{"mode":"ladder","batch":$batchSize,""" +
          s""""store_batches":$storeBatches,"sf":"$sfDir",""" +
          s""""total_sec":${j(total)},"stages":{$rows}}"""
        try java.nio.file.Files.write(java.nio.file.Paths.get(out),
          (line + "\n").getBytes("UTF-8"))
        catch { case e: Exception =>
          System.err.println(s"[gateprofile] $out not written: $e") }
        println(line)
      }
    }
  }
}
