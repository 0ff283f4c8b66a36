package graft

/** Smoke test of the graft.Run CLI (S5 parity): one invocation writes t1–t6
  * CSVs from the public query surface, with a per-run separator. */
class RunSpec extends SparkTestBase {

  test("Run writes a query's CSV with a configurable separator") {
    spark // force the shared session so Run reuses it instead of stopping its own
    val out = java.nio.file.Files.createTempDirectory("graft-run").toString
    Run.run(Array("t1_top10_authors_per_venue", "/root/testdata/sf0.001", out,
      "--sep", "|"))
    val back = spark.read.option("sep", "|").option("header", "true")
      .csv(s"$out/t1_top10_authors_per_venue")
    back.columns.toSeq shouldBe Seq("venue", "author", "cnt")
    back.count() should be > 0L
  }

  test("Run rejects an unknown query name without touching Spark") {
    the[IllegalArgumentException] thrownBy {
      Run.run(Array("no_such_query", "/root/testdata/sf0.001", "/tmp/x"))
    } should have message "unknown query 'no_such_query' — run `graft.Run list`"
  }
}
