package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{Jsonl, Tables}

/** JSONL corpus ingestion: lossless roundtrip against the parquet documents
  * table and corrupt-line quarantine semantics. */
class JsonlSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("documents roundtrip parquet -> jsonl -> parquet is lossless") {
    val out = Files.createTempDirectory("graft-jsonl").toString
    val docs = Tables.documents(spark, sf)
    Jsonl.write(docs, out)
    val back = Jsonl.read(spark, out, Jsonl.DocumentsSchema)
    val (good, bad) = Jsonl.quarantine(back)
    bad.count() shouldBe 0L
    good.columns.toSeq shouldBe docs.columns.toSeq
    rows(good.orderBy("doc_id")) shouldBe rows(docs.orderBy("doc_id"))
  }

  test("malformed lines are quarantined with the raw line, not dropped or fatal") {
    val dir = Files.createTempDirectory("graft-jsonl-bad")
    val f = dir.resolve("part-0.jsonl")
    Files.writeString(f,
      """{"doc_id": 1, "text": "ok one", "lang": "en", "source": "a", "n_chars": 6}
        |this is not json at all
        |{"doc_id": 2, "text": "ok two", "lang": "de", "source": "b", "n_chars": 6}
        |{"doc_id": 3, "text": "truncated
        |""".stripMargin)
    val df = Jsonl.read(spark, dir.toString, Jsonl.DocumentsSchema)
    val (good, bad) = Jsonl.quarantine(df)
    good.count() shouldBe 2L
    rows(good.select("doc_id").orderBy("doc_id")) shouldBe Seq(Seq(1L), Seq(2L))
    val badLines = bad.collect().map(_.getString(0)).toSeq
    badLines should have size 2
    badLines should contain("this is not json at all")
    // schema of good side carries no capture column
    good.columns should not contain Jsonl.CorruptCol
  }
}
