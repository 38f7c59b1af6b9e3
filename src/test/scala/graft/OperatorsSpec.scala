package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // user, event, ts, kind, value
    (1L, 10L, "2024-01-01 10:00:00", "click", 1.0),
    (1L, 11L, "2024-01-01 10:10:00", "click", 2.0),
    (1L, 12L, "2024-01-01 11:30:00", "view", 3.0),
    (2L, 20L, "2024-01-02 09:00:00", "click", 4.0),
    (2L, 21L, "2024-01-02 09:00:00", "click", 5.0))
    .toDF("user_id", "event_id", "ts", "event_type", "value")
    .withColumn("ts", to_timestamp(col("ts")))

  test("Dedup.keepLatest keeps newest row per key with tie-break") {
    val got = Dedup.keepLatest(events, Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(12L, 21L)) // user2: equal ts → higher event_id wins
  }

  test("Dedup.keepFirstByHash keeps first and passes null/empty hashes") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, ""), (4L, "")).toDF("id", "h")
    val got = Dedup.keepFirstByHash(df, when(col("h") =!= "", md5(col("h"))), Seq(col("id")))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 4L)) // both empty-hash rows kept
  }

  test("Dedup.exact groups by content hash with min-id winner") {
    val df = Seq((5L, "same"), (2L, "same"), (9L, "other")).toDF("id", "t")
    val got = Dedup.exact(df, Seq(col("t")), col("id"))
      .select("keep_id", "dup_count").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 2L), (9L, 1L)))
  }

  test("Upsert.merge: incoming beats existing on version order; mergeWrite idempotent") {
    val existing = Seq((1L, "a", 1L, 100L), (2L, "b", 1L, 100L)).toDF("k", "v", "ver", "eid")
    val incoming = Seq((1L, "a2", 2L, 101L)).toDF("k", "v", "ver", "eid")
    val merged = Upsert.merge(existing, incoming, Seq("k"), Seq(col("ver"), col("eid")))
    assert(merged.select("k", "v").as[(Long, String)].collect().toSet ==
      Set((1L, "a2"), (2L, "b")))
    val dir = Files.createTempDirectory("graft-upsert").toString + "/t"
    Upsert.mergeWrite(existing, incoming, Seq("k"), Seq(col("ver"), col("eid")), dir)
    val after1 = spark.read.parquet(dir).collect().toSet
    Upsert.mergeWrite(spark.read.parquet(dir), incoming, Seq("k"),
      Seq(col("ver"), col("eid")), dir + "2")
    assert(spark.read.parquet(dir + "2").collect().toSet == after1) // re-apply = no-op
  }

  test("Upsert.mergeWritePartitioned touches only affected partition dirs") {
    val root = Files.createTempDirectory("graft-upsert-part").toString + "/t"
    val initial = Seq(
      (1L, "a", 1L, "2024-01-01"), (2L, "b", 1L, "2024-01-01"),
      (3L, "c", 1L, "2024-01-02"), (4L, "d", 1L, "2024-01-03"))
      .toDF("k", "v", "ver", "dt")
    initial.write.partitionBy("dt").parquet(root)
    def partFiles(p: String): Set[(String, Long)] = {
      val d = new java.io.File(s"$root/dt=$p")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    }
    val untouched01 = partFiles("2024-01-01")
    val untouched03 = partFiles("2024-01-03")
    // incoming: update k=3 and insert k=5, both in dt=2024-01-02
    val incoming = Seq((3L, "c2", 2L, "2024-01-02"), (5L, "e", 1L, "2024-01-02"))
      .toDF("k", "v", "ver", "dt")
    Upsert.mergeWritePartitioned(incoming, Seq("k"), Seq(col("ver")), root, "dt")
    // untouched partitions: identical files, not rewritten or renamed
    assert(partFiles("2024-01-01") == untouched01)
    assert(partFiles("2024-01-03") == untouched03)
    val after = spark.read.parquet(root).select("k", "v").as[(Long, String)].collect().toSet
    assert(after == Set((1L, "a"), (2L, "b"), (3L, "c2"), (4L, "d"), (5L, "e")))
    // idempotent: re-applying the same batch changes nothing
    Upsert.mergeWritePartitioned(incoming, Seq("k"), Seq(col("ver")), root, "dt")
    assert(spark.read.parquet(root).select("k", "v").as[(Long, String)].collect().toSet == after)
    // crash healing: a stray aside-copy leftover with its target
    // missing is restored when that partition is touched again
    val fs = new java.io.File(s"$root/dt=2024-01-02")
    assert(fs.renameTo(new java.io.File(s"$root/.dt=2024-01-02__graft_old")))
    Upsert.mergeWritePartitioned(incoming, Seq("k"), Seq(col("ver")), root, "dt")
    assert(spark.read.parquet(root).select("k", "v").as[(Long, String)].collect().toSet == after)
    // a real partition whose VALUE ends in __old is data, not a
    // crash leftover — merges elsewhere must never touch it
    Seq((9L, "z", 1L, "alpha__old")).toDF("k", "v", "ver", "dt")
      .write.mode("append").partitionBy("dt").parquet(root)
    Upsert.mergeWritePartitioned(incoming, Seq("k"), Seq(col("ver")), root, "dt")
    assert(spark.read.parquet(root).filter(col("dt") === "alpha__old").count() == 1)
  }

  test("Upsert.mergeWritePartitioned escapes hive partition names; nulls rejected") {
    val root = Files.createTempDirectory("graft-upsert-esc").toString + "/t"
    // timestamp-string partition values: Spark writes '00%3A00%3A00'
    val initial = Seq((1L, "a", 1L, "2024-01-01 00:00:00"), (2L, "b", 1L, "2024-01-02 00:00:00"))
      .toDF("k", "v", "ver", "dt")
    initial.write.partitionBy("dt").parquet(root)
    val incoming = Seq((1L, "a2", 2L, "2024-01-01 00:00:00")).toDF("k", "v", "ver", "dt")
    Upsert.mergeWritePartitioned(incoming, Seq("k"), Seq(col("ver")), root, "dt")
    val after = spark.read.parquet(root).select("k", "v").as[(Long, String)].collect().toSet
    assert(after == Set((1L, "a2"), (2L, "b")))
    val withNull = Seq((3L, "c", 1L, null: String)).toDF("k", "v", "ver", "dt")
    intercept[IllegalArgumentException] {
      Upsert.mergeWritePartitioned(withNull, Seq("k"), Seq(col("ver")), root, "dt")
    }
    val withEmpty = Seq((3L, "c", 1L, "")).toDF("k", "v", "ver", "dt")
    intercept[IllegalArgumentException] {
      Upsert.mergeWritePartitioned(withEmpty, Seq("k"), Seq(col("ver")), root, "dt")
    }
  }

  test("Upsert.mergeWritePartitioned keeps numeric-LOOKING string partitions intact") {
    // partition inference would read dir dt=007 back as int 7; a
    // value-level filter would then match nothing and replace the
    // partition with just the batch — directory-identity reads don't
    val root = Files.createTempDirectory("graft-upsert-007").toString + "/t"
    Seq((1L, "a", 1L, "007"), (2L, "b", 1L, "007"), (3L, "c", 1L, "008"))
      .toDF("k", "v", "ver", "dt").write.partitionBy("dt").parquet(root)
    val incoming = Seq((1L, "a2", 2L, "007")).toDF("k", "v", "ver", "dt")
    Upsert.mergeWritePartitioned(incoming, Seq("k"), Seq(col("ver")), root, "dt")
    val rows = spark.read.parquet(root).selectExpr("k", "v", "cast(dt as string) dt")
      .as[(Long, String, String)].collect().toSet
    assert(rows == Set((1L, "a2", "7"), (2L, "b", "7"), (3L, "c", "8")) ||
      rows == Set((1L, "a2", "007"), (2L, "b", "007"), (3L, "c", "008")))
    // the critical property: k=2 survived the merge of its partition
  }

  test("Upsert.heal restores a table whose swap crashed mid-rename") {
    val dir = Files.createTempDirectory("graft-heal").toString + "/t"
    val df = Seq((1L, "x")).toDF("k", "v")
    df.write.parquet(dir)
    // simulate the crash window: target renamed aside, staging never in
    val aside = new java.io.File(new java.io.File(dir).getParent, ".t__graft_old")
    assert(new java.io.File(dir).renameTo(aside))
    Upsert.heal(spark, dir)
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("Components.connected: chains merge, singletons survive, long chain converges") {
    val nodes = (1L to 12L).toDF("n")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L),
      // a 5-long chain exercising multiple propagation rounds
      (7L, 8L), (8L, 9L), (9L, 10L), (10L, 11L)).toDF("a", "b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L,
      7L -> 7L, 8L -> 7L, 9L -> 7L, 10L -> 7L, 11L -> 7L, 12L -> 12L)
    // default: the driver union-find fast path (edge list under limit)
    val got = Components.connected(nodes, col("n"), edges, col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
    // driverLimit = 0 forces the DISTRIBUTED iteration — identical labels
    val dist = Components.connected(nodes, col("n"), edges, col("a"), col("b"),
        driverLimit = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dist == want)
  }

  test("Components.connected: string ids work (no silent long-cast), int ids keep schema parity") {
    // STRING ids must route to the distributed path — the old fast
    // path cast them to long (→ null) and returned all-singletons
    val sNodes = Seq("a", "b", "c", "d").toDF("n")
    val sEdges = Seq(("a", "b"), ("b", "c")).toDF("x", "y")
    val sGot = Components.connected(sNodes, col("n"), sEdges, col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(sGot == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "d"))
    // INT ids: fast path and distributed path must agree on the comp
    // type (the old fast path widened comp to long)
    val iNodes = Seq(1, 2, 3).toDF("n")
    val iEdges = Seq((1, 2)).toDF("x", "y")
    val fast = Components.connected(iNodes, col("n"), iEdges, col("x"), col("y"))
    val dist2 = Components.connected(iNodes, col("n"), iEdges, col("x"), col("y"),
      driverLimit = 0L)
    assert(fast.schema("comp").dataType == dist2.schema("comp").dataType)
    assert(fast.collect().map(r => (r.getInt(0), r.getInt(1))).toMap ==
      dist2.collect().map(r => (r.getInt(0), r.getInt(1))).toMap)
  }

  test("Components.canonicalBy: keeper maximizes score, id breaks ties, singletons keep") {
    // cluster {1,2,3}: best score on 3 (keep-min-id would keep 1);
    // cluster {5,6}: tied scores → smaller id 5 keeps; 4 is a singleton
    val nodes = Seq((1L, 0.2), (2L, 0.9), (3L, 0.95), (4L, 0.0),
      (5L, 0.5), (6L, 0.5)).toDF("n", "q")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = Components.canonicalBy(nodes, col("n"), col("q"),
        edges, col("a"), col("b"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> (1L, 0L), 2L -> (1L, 0L), 3L -> (1L, 1L),
      4L -> (4L, 1L),
      5L -> (5L, 1L), 6L -> (5L, 0L)))
  }

  test("Tables.loadGenerations: added columns null-fill, numeric width widens, conflicts fail") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gen").toString
    // generation 1: (id int, score float); generation 2 adds lang and
    // widens both numeric columns
    spark.createDataFrame(Seq((1, 0.5f), (2, 0.75f))).toDF("id", "score")
      .write.parquet(s"$dir/g1")
    Seq((10L, 0.25, "en"), (11L, 1.0, "de")).toDF("id", "score", "lang")
      .write.parquet(s"$dir/g2")
    val got = Tables.loadGenerations(spark, Seq(s"$dir/g1", s"$dir/g2"))
    assert(got.schema("id").dataType.typeName == "long")
    assert(got.schema("score").dataType.typeName == "double")
    // FIRST-SEEN column order: generation 1's (id, score), then the
    // added lang — never alphabetical
    assert(got.columns.toSeq == Seq("id", "score", "lang"))
    val rows = got.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2))))
    assert(rows.toSeq == Seq((1L, 0.5, None), (2L, 0.75, None),
      (10L, 0.25, Some("en")), (11L, 1.0, Some("de"))))
    // incompatible drift: string vs long must fail loudly
    Seq(("x", 1L)).toDF("id", "v").write.parquet(s"$dir/g3")
    intercept[IllegalArgumentException] {
      Tables.loadGenerations(spark, Seq(s"$dir/g1", s"$dir/g3"))
    }
    // decimal WIDTH drift widens to hold both: (10,2) vs (12,6) keeps
    // max integral digits (8) + max scale (6) → (14,6); values keep
    // their exact decimal meaning
    import org.apache.spark.sql.functions.lit
    Seq(1).toDF("k").select(lit("1").cast("decimal(10,2)").as("amt"))
      .write.parquet(s"$dir/g4")
    Seq(1).toDF("k").select(lit("2.5").cast("decimal(12,6)").as("amt"))
      .write.parquet(s"$dir/g5")
    val dec = Tables.loadGenerations(spark, Seq(s"$dir/g4", s"$dir/g5"))
    assert(dec.schema("amt").dataType ==
      org.apache.spark.sql.types.DecimalType(14, 6))
    assert(dec.orderBy("amt").collect().map(_.getDecimal(0).toPlainString).toSeq ==
      Seq("1.000000", "2.500000"))
  }

  test("Phrases.collocations: PMI math, count floor, empty corpus") {
    // "new york" always together (PMI high); "the cat"/"the dog"
    // mixes (PMI lower); singletons below the floor vanish
    val docs = (1 to 6).map(i => (i.toLong,
      "new york " + (if (i % 2 == 0) "the cat" else "the dog"))).toDF("doc_id", "text")
    val got = Phrases.collocations(docs, col("text"), minCount = 3)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    // tokens: 6 docs × 4 tokens = 24 unigrams; 6×3 = 18 bigrams
    // "new york": c=6, p=6/18; p(new)=p(york)=6/24 → PMI=ln((1/3)/(1/16))
    assert(got.keySet == Set(("new", "york"), ("york", "the"), ("the", "cat"), ("the", "dog")))
    val (cNy, pmiNy) = got(("new", "york"))
    assert(cNy == 6L && math.abs(pmiNy - math.log((6.0 / 18) / ((6.0 / 24) * (6.0 / 24)))) < 1e-6)
    // "the cat": c=3, p=3/18; p(the)=6/24, p(cat)=3/24 —
    // coincidentally ln(16/3) as well; assert the exact formula
    val (cCat, pmiCat) = got(("the", "cat"))
    assert(cCat == 3L && math.abs(pmiCat -
      math.log((3.0 / 18) / ((6.0 / 24) * (3.0 / 24)))) < 1e-6)
    // floor: minCount above everything → empty; empty corpus → empty
    assert(Phrases.collocations(docs, col("text"), minCount = 100).count() == 0)
    assert(Phrases.collocations(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), col("text")).count() == 0)
  }

  test("Cleanup.nullifyOrphans nulls refs missing from target") {
    val refs = Seq((1L, 10L), (2L, 99L)).toDF("id", "ref")
    val target = Seq(Tuple1(10L)).toDF("key")
    val got = Cleanup.nullifyOrphans(refs, "ref", target, "key")
      .orderBy("id").select("ref").collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    assert(got.toSeq == Seq(10L, -1L))
  }

  test("Cleanup.purgeFailed keeps survivors only") {
    val got = Cleanup.purgeFailed(
      events.withColumn("event_type",
        when(col("event_id") === 10, "error").otherwise(col("event_type"))),
      col("event_type"), Seq("error"), col("value"), 1, col("ts"), "2024-06-01 00:00:00")
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(11L, 12L, 20L, 21L))
  }

  test("ModeFilter incremental honors the instant, not its midnight") {
    // events at 10:00 and 11:30 on Jan 1; lookback 1 day from Jan 2 10:30
    val got = ModeFilter(events, col("ts"), "incremental", "2024-01-02 10:30:00", 1)
      .select("event_id").as[Long].collect().toSet
    // 10:00 and 10:10 on Jan 1 are OLDER than 1 day before the
    // instant (the pre-fix midnight truncation wrongly kept them)
    assert(got == Set(12L, 20L, 21L))
  }

  test("ModeFilter modes select the right windows") {
    val now = "2024-01-02 00:00:00"
    assert(ModeFilter(events, col("ts"), "incremental", now, 1).count() == 5)
    assert(ModeFilter(events, col("ts"), "refresh_old", now, 1).count() == 0)
    assert(ModeFilter(events, col("ts"), "daily", now, 0).count() == 2)
    assert(ModeFilter(events, col("ts"), "full", now, 0).count() == 5)
    intercept[IllegalArgumentException] {
      ModeFilter(events, col("ts"), "bogus", now, 0)
    }
  }

  test("Sessionize splits on gap and summarizes bounds") {
    val got = Sessionize.summarize(events, col("user_id"), col("ts"), col("event_id"), 1800)
      .orderBy("key", "session_id")
      .select(col("key"), col("session_id"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSeq
    // user1: 10:00+10:10 in one session, 11:30 a new one; user2: both at 09:00
    assert(got == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 2L)))
  }

  test("Shingles.exploded equals the column-level shingle builder") {
    val docs = Seq((1L, "A b c d"), (2L, "x y"), (3L, "p q r")).toDF("doc_id", "text")
    val viaRows = Shingles.exploded(docs, col("doc_id"), col("text"), 3)
      .groupBy("id").agg(sort_array(collect_list("sh")).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    val viaCols = docs.select(col("doc_id"),
        sort_array(TextFunctions_wordShinglesLower(col("text"), 3)).as("s"))
      .as[(Long, Seq[String])].collect().toMap
      .filter(_._2.nonEmpty)
    assert(viaRows == viaCols)
  }

  private def TextFunctions_wordShinglesLower(t: org.apache.spark.sql.Column, n: Int) =
    graft.functions.TextFunctions.wordShingles(lower(t), n)
}
