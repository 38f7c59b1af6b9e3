package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.operators.Upsert
import graft.sources.Versioned

/** E13 versioned snapshot table: the reader-race gap of the in-place
  * swap writers, closed. The key test walks a reader through EVERY
  * intermediate state of a publish and demands a complete old or new
  * snapshot each time — never a missing path, never partial data.
  */
class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(rows: (Long, String, Long)*) =
    rows.toDF("k", "payload", "ver")

  test("mergeWrite: keep-latest semantics, idempotent replay") {
    val base = Files.createTempDirectory("graft-versioned").toString + "/t"
    Versioned.mergeWrite(tbl((1L, "a", 1L), (2L, "b", 1L)), Seq("k"), Seq(col("ver")), base)
    Versioned.mergeWrite(tbl((2L, "B", 2L), (3L, "c", 2L)), Seq("k"), Seq(col("ver")), base)
    val want = Set((1L, "a", 1L), (2L, "B", 2L), (3L, "c", 2L))
    def got() = Versioned.read(spark, base).as[(Long, String, Long)].collect().toSet
    assert(got() == want)
    // replaying the same batch publishes a new version with identical rows
    val v = Versioned.mergeWrite(tbl((2L, "B", 2L), (3L, "c", 2L)), Seq("k"), Seq(col("ver")), base)
    assert(got() == want)
    assert(v == 3L)
  }

  test("a reader sees a complete snapshot at every intermediate publish state") {
    val base = Files.createTempDirectory("graft-versioned").toString + "/t"
    val old = tbl((1L, "a", 1L), (2L, "b", 1L))
    Versioned.write(old, base)
    val wantOld = old.as[(Long, String, Long)].collect().toSet

    def readNow() = Versioned.read(spark, base).as[(Long, String, Long)].collect().toSet

    // state 1: next version's data files fully written, marker absent
    // (= a writer mid-publish, or a crashed one) → reader gets OLD
    val merged = Upsert.merge(old, tbl((2L, "B", 2L)), Seq("k"), Seq(col("ver")))
    merged.write.parquet(s"$base/v00002")
    assert(readNow() == wantOld, "mid-publish reader must see the old snapshot")

    // state 2: marker created (the atomic publish) → reader gets NEW
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new Path(s"$base/v00002/_graft_committed"), false).close()
    val wantNew = Set((1L, "a", 1L), (2L, "B", 2L))
    assert(readNow() == wantNew, "post-publish reader must see the new snapshot")

    // state 3: after the NEXT write's GC, a reader that resolved the
    // previous snapshot before GC can still finish reading it (keep=1)
    val v2Dir = Versioned.currentSnapshot(spark, base).get._2
    Versioned.write(tbl((9L, "z", 9L)), base, keep = 1)
    assert(spark.read.parquet(v2Dir).as[(Long, String, Long)].collect().toSet == wantNew,
      "previous snapshot must survive one more write for in-flight readers")
    // ... but the one before it is gone, and v1 was never resurrected
    assert(!fs.exists(new Path(s"$base/v00001")))
  }

  test("crashed-writer leftovers: never visible, never reused, cleaned by the next write") {
    val base = Files.createTempDirectory("graft-versioned").toString + "/t"
    Versioned.write(tbl((1L, "a", 1L)), base)
    // a writer died after writing data, before the marker
    tbl((6L, "dead", 6L)).write.parquet(s"$base/v00002")
    assert(Versioned.currentSnapshot(spark, base).get._1 == 1L)
    // next write must skip the dead dir's version, then GC it
    val v = Versioned.write(tbl((2L, "b", 2L)), base)
    assert(v == 3L, "crashed dir's version must never be reused")
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$base/v00002")), "dead uncommitted dir must be GC'd")
    assert(Versioned.read(spark, base).as[(Long, String, Long)].collect().toSet ==
      Set((2L, "b", 2L)))
  }

  test("commit fails loudly if the in-flight dir was gutted before the marker (no empty publish)") {
    val base = Files.createTempDirectory("graft-versioned").toString + "/t"
    Versioned.write(tbl((1L, "a", 1L)), base)
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // inject a contract-violating concurrent writer's GC: delete the
    // in-flight dir between the data write and the marker create.
    // Without the _SUCCESS commit guard this would recreate v00002
    // holding ONLY the marker — an empty snapshot reading as success.
    val e = intercept[IllegalArgumentException] {
      Versioned.write(tbl((2L, "b", 2L)), base, keep = 1,
        beforeCommit = () => { fs.delete(new Path(s"$base/v00002"), true); () })
    }
    assert(e.getMessage.contains("_SUCCESS"))
    // nothing was published: current is still v1, and no empty v2 dir
    // with a marker exists
    assert(Versioned.currentSnapshot(spark, base).get._1 == 1L)
    assert(!fs.exists(new Path(s"$base/v00002/_graft_committed")))
    assert(Versioned.read(spark, base).as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 1L)))
    // and a healthy retry (no race) publishes cleanly
    val v = Versioned.write(tbl((2L, "b", 2L)), base)
    assert(v >= 2L)
    assert(Versioned.read(spark, base).as[(Long, String, Long)].collect().toSet ==
      Set((2L, "b", 2L)))
  }

  test("compact: fewer files, identical rows, old snapshot retained, rerun no-ops") {
    val base = Files.createTempDirectory("graft-compact").toString + "/t"
    val rows = (1L to 400L).map(i => (i, s"payload_$i", i))
    // publish deliberately fragmented: 20 small files
    val v1 = Versioned.write(tbl(rows: _*).repartition(20), base)
    val snap1 = Versioned.currentSnapshot(spark, base).get._2
    def dataFiles(dir: String) =
      new java.io.File(dir).listFiles.filter(f =>
        f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")).length
    assert(dataFiles(snap1.stripPrefix("file:")) == 20)

    // huge targetBytes → everything fits one file
    val (v2, before, after) = Versioned.compact(spark, base, targetBytes = 1L << 30)
    assert(v2 == v1 + 1 && before == 20 && after == 1)
    val snap2 = Versioned.currentSnapshot(spark, base).get._2
    assert(dataFiles(snap2.stripPrefix("file:")) == 1)
    assert(Versioned.read(spark, base).as[(Long, String, Long)].collect().toSet
      == rows.toSet)
    // keep=1 (default): the pre-compaction snapshot survives for
    // in-flight readers
    assert(spark.read.parquet(snap1).count() == 400)

    // already compact → no-op, same version, nothing written
    val (v3, b3, a3) = Versioned.compact(spark, base, targetBytes = 1L << 30)
    assert(v3 == v2 && b3 == 1 && a3 == 1)

    // sorted variant: range-clustered output, rows still identical
    Versioned.write(tbl(rows: _*).repartition(16), base)
    val (_, _, afterSorted) = Versioned.compact(spark, base,
      targetBytes = totalSnapshotBytes(base) / 4 + 1, sortCols = Seq("k"))
    assert(afterSorted >= 2)
    assert(Versioned.read(spark, base).as[(Long, String, Long)].collect().toSet
      == rows.toSet)
    // file-level clustering: per-file [min k, max k] ranges must not
    // overlap (that's what buys row-group pruning on k)
    val snap = Versioned.currentSnapshot(spark, base).get._2
    val ranges = new java.io.File(snap.stripPrefix("file:")).listFiles
      .filter(f => f.getName.endsWith(".parquet"))
      .map { f =>
        val d = spark.read.parquet(f.getAbsolutePath).agg(min("k"), max("k")).head()
        (d.getLong(0), d.getLong(1))
      }.sortBy(_._1)
    assert(ranges.sliding(2).forall {
      case Array((_, hi), (lo, _)) => hi <= lo
      case _ => true
    }, s"file k-ranges overlap: ${ranges.toSeq}")
  }

  private def totalSnapshotBytes(base: String): Long = {
    val snap = Versioned.currentSnapshot(spark, base).get._2
    new java.io.File(snap.stripPrefix("file:")).listFiles
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.length).sum
  }

  test("keep=2 retains two older committed snapshots") {
    val base = Files.createTempDirectory("graft-versioned").toString + "/t"
    for (i <- 1 to 4) Versioned.write(tbl((i.toLong, s"r$i", i.toLong)), base, keep = 2)
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$base/v00001")))
    for (i <- 2 to 4) assert(fs.exists(new Path(f"$base/v$i%05d")), s"v$i should be retained")
  }
}
