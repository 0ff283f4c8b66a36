package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.{Lake, LakeBloom}

/** Per-file BLOOM FILTER indexes ([[graft.sources.LakeBloom]]): sidecar
  * build via ANALYZE … COMPUTE BLOOM, point-lookup file skipping through
  * the injected prune rule on a layout min/max stats provably cannot
  * prune, write-path maintenance, coverage soundness, and vacuum GC. */
class LakeBloomSpec extends SparkTestBase {

  private def withExtendedSession[A](f: SparkSession => A): A = {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = GraftSession.tune(SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new org.apache.spark.sql.graft.GraftSessionExtensions))
      .getOrCreate()
    try f(s2)
    finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  private def scannedFiles(df: DataFrame): Set[String] =
    df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }.flatMap(_.relation.location.inputFiles)
      .map(p => new org.apache.hadoop.fs.Path(p).getName).toSet

  /** 90 keys in 3 key-range files (1-30, 31-60, 61-90); `v` is
    * INTERLEAVED across files — v % 3 picks the file, so every file's
    * [min,max] on v spans nearly the whole domain and range stats can
    * never prune an equality, while each VALUE lives in exactly one
    * file. The bloom-index shape. */
  private def mkInterleaved(s: SparkSession) = {
    import s.implicits._
    val df = (1L to 90L).map { k =>
      val fileIdx = (k - 1) / 30 // 0, 1, 2 by key range
      val v = ((k - 1) % 30) * 3 + fileIdx // interleaved domains
      (k, v, s"name-$v")
    }.toDF("k", "v", "tag")
    Lake.create(s, Lake.freshRoot(), df, "k", 3)
  }

  test("equality and IN on an interleaved column skip to exactly the holding files") {
    withExtendedSession { s =>
      val t = mkInterleaved(s)
      s.sql(s"ANALYZE TABLE graft_lake('${t.root}') " +
        "COMPUTE BLOOM FOR COLUMNS v, tag").collect()
      // range stats CANNOT prune this layout even if computed: every
      // file's v-range is ~[0, 89]; the bloom must cut to one file
      val q1 = t.read().filter(col("v") === 31L) // fileIdx 1 (31 % 3)
      scannedFiles(q1).size shouldBe 1
      rows(q1.select("k")) shouldBe Seq(Seq(41L))
      // IN list spanning two files scans two
      val q2 = t.read().filter(col("v").isin(30L, 31L)) // files 0 and 1
      scannedFiles(q2).size shouldBe 2
      q2.count() shouldBe 2L
      // a STRING bloom prunes the same way
      val q3 = t.read().filter(col("tag") === "name-32") // fileIdx 2
      scannedFiles(q3).size shouldBe 1
      rows(q3.select("k")) shouldBe Seq(Seq(71L))
      // absent value: every covered file proves it out — zero files
      val q4 = t.read().filter(col("v") === 5000L)
      scannedFiles(q4).size shouldBe 0
      q4.count() shouldBe 0L
    }
  }

  test("writes after the declaration maintain coverage for their new files") {
    withExtendedSession { s =>
      import s.implicits._
      val t = mkInterleaved(s)
      s.sql(s"ANALYZE TABLE graft_lake('${t.root}') " +
        "COMPUTE BLOOM FOR COLUMNS v, tag").collect()
      // merge hits only the FIRST file's key range; its rewrite gets a
      // fresh bloom in the same write path, carried files keep theirs
      t.merge(Seq((5L, 900L, "upd")).toDF("k", "v", "tag"))
      val q1 = t.read().filter(col("v") === 900L)
      scannedFiles(q1).size shouldBe 1
      rows(q1.select("k")) shouldBe Seq(Seq(5L))
      // untouched files' coverage still prunes: v=31 lives in file 1
      val q2 = t.read().filter(col("v") === 31L)
      scannedFiles(q2).size shouldBe 1
      rows(q2.select("k")) shouldBe Seq(Seq(41L))
      // the merged-away value 12 (k=5 had v=12 before) no longer exists;
      // its old file was REWRITTEN, so the fresh bloom proves it out
      val q3 = t.read().filter(col("v") === 12L)
      scannedFiles(q3).size shouldBe 0
      // full coverage is VISIBLE: graft_lake_detail reports covered/files
      val cov0 = t.detailDf().collect()(0).getAs[String]("bloom_coverage")
      val n0 = t.manifest(t.latestVersion).files.size
      cov0 should include(s"v:$n0/$n0")
      // OPTIMIZE rewrites every file — the same write path re-blooms
      // them, so pruning (and the coverage metric) survive compaction
      t.compact(3)
      val q4 = t.read().filter(col("v") === 900L)
      scannedFiles(q4).size shouldBe 1
      rows(q4.select("k")) shouldBe Seq(Seq(5L))
      t.detailDf().collect()(0).getAs[String]("bloom_coverage") should
        include("v:3/3")
      // the INCREMENTAL maintenance verbs re-bloom their rewrites too:
      // BINPACK's folded output and OPTIMIZE … WHERE's scoped rewrite
      // keep full coverage without any manual re-ANALYZE
      t.insertAll(Seq((2000L, 901L, "bp")).toDF("k", "v", "tag"))
      t.compactBinPack(minRows = 5)
      val nBp = t.manifest(t.latestVersion).files.size
      t.detailDf().collect()(0).getAs[String]("bloom_coverage") should
        include(s"v:$nBp/$nBp")
      t.compactWhere(col("k") <= 50L)
      val nCw = t.manifest(t.latestVersion).files.size
      t.detailDf().collect()(0).getAs[String]("bloom_coverage") should
        include(s"v:$nCw/$nCw")
      val q5 = t.read().filter(col("v") === 901L)
      scannedFiles(q5).size shouldBe 1
      rows(q5.select("k")) shouldBe Seq(Seq(2000L))
    }
  }

  test("files without coverage are never pruned; declaration alone is inert") {
    withExtendedSession { s =>
      val t = mkInterleaved(s)
      // declare WITHOUT building (marker only) — existing files have no
      // sidecar rows, so every lookup keeps all files and stays correct
      LakeBloom.writeConfig(
        new org.apache.hadoop.fs.Path(t.root).getFileSystem(
          s.sparkContext.hadoopConfiguration),
        new org.apache.hadoop.fs.Path(t.root),
        LakeBloom.Config(Seq("v"), 10))
      val q = t.read().filter(col("v") === 31L)
      scannedFiles(q).size shouldBe 3
      rows(q.select("k")) shouldBe Seq(Seq(41L))
    }
  }

  test("no false negatives across the whole domain; BITS sizing accepted") {
    withExtendedSession { s =>
      val t = mkInterleaved(s)
      s.sql(s"ANALYZE TABLE graft_lake('${t.root}') " +
        "COMPUTE BLOOM FILTER BITS 16 FOR COLUMNS v").collect()
      // every present value must come back — a bloom may over-RETAIN
      // files (fpp) but can never lose a row
      val got = t.read().filter(col("v").between(0L, 89L))
        .agg(count(lit(1)), sum(col("v"))).collect()(0)
      got.getLong(0) shouldBe 90L
      got.getLong(1) shouldBe (0L to 89L).sum
      (0L to 89L by 17L).foreach { v =>
        t.read().filter(col("v") === v).count() shouldBe 1L
      }
    }
  }

  test("unsupported column types and unknown columns refuse loudly") {
    withExtendedSession { s =>
      import s.implicits._
      val df = (1L to 10L).map(k => (k, k * 0.5)).toDF("k", "d")
      val t = Lake.create(s, Lake.freshRoot(), df, "k", 2)
      intercept[IllegalArgumentException] {
        t.analyzeBloom(Seq("d")) // DoubleType: no exact stat unit
      }.getMessage should include("unsupported type")
      intercept[IllegalArgumentException] {
        t.analyzeBloom(Seq("nope"))
      }.getMessage should include("unknown column")
    }
  }

  test("vacuum sweeps sidecars whose files all died; live coverage survives") {
    withExtendedSession { s =>
      val t = mkInterleaved(s)
      s.sql(s"ANALYZE TABLE graft_lake('${t.root}') " +
        "COMPUTE BLOOM FOR COLUMNS v, tag").collect()
      val root = new org.apache.hadoop.fs.Path(t.root)
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      val bloomDir = new org.apache.hadoop.fs.Path(t.root, "_bloom")
      def sidecars(): Set[String] = fs.listStatus(bloomDir)
        .map(_.getPath.getName).filter(_.startsWith("bloom-")).toSet
      val before = sidecars()
      before.nonEmpty shouldBe true
      // compact rewrites everything (new files get fresh blooms via the
      // write path); vacuum kills the old files AND their orphaned
      // sidecars, while the compacted file's coverage keeps pruning
      t.compact(1)
      t.vacuum(1)
      val after = sidecars()
      after.intersect(before) shouldBe Set.empty
      after.nonEmpty shouldBe true
      val q = t.read().filter(col("v") === 31L)
      scannedFiles(q).size shouldBe 1
      rows(q.select("k")) shouldBe Seq(Seq(41L))
      // absent value proves out against the compacted file too
      t.read().filter(col("v") === 5000L).count() shouldBe 0L
    }
  }
}
