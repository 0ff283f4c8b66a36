package graft

import graft.extensions.Dedup

/** Planted-fixture semantics for the global line-level (segment) dedup:
  * cross-doc duplicate segments keep only the corpus-wide first occurrence,
  * intra-doc repeats keep only the first, partial tail segments count their
  * true token length. SegLen = 10 tokens per segment.
  */
class LineDedupSpec extends SparkTestBase {

  private def seg(prefix: String, n: Int = Dedup.SegLen): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("line-dedup").toString
    Seq(
      // doc 0: segments A, B — both first occurrences
      (0L, seg("a") + " " + seg("b")),
      // doc 1: segment A again (dup of doc 0) + unique C
      (1L, seg("a") + " " + seg("c")),
      // doc 2: unique D + 5-token partial tail
      (2L, seg("d") + " " + seg("e", 5)),
      // doc 3: the same segment twice (intra-doc dup)
      (3L, seg("f") + " " + seg("f"))
    ).toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    d
  }

  test("first occurrence survives; cross-doc and intra-doc repeats are removed") {
    rows(Dedup.dedupLinesGlobal(spark, dir)) shouldBe Seq(
      Seq(0L, 2L, 2L, 20L, 20L), // both segments novel
      Seq(1L, 2L, 1L, 20L, 10L), // segment A already seen in doc 0
      Seq(2L, 2L, 2L, 15L, 15L), // partial tail counts 5 tokens
      Seq(3L, 2L, 1L, 20L, 10L)) // second in-doc copy removed
  }
}
