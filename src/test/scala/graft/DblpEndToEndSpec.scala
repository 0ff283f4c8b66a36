package graft

import graft.model.Dblp
import graft.queries.DblpQueries
import graft.sources.Sinks

/** End-to-end: line-XML file → readLineXml → queries → CSV sink, the full
  * reference pipeline shape (S2→S3→P*→A*→K*→S4) through the public API. */
class DblpEndToEndSpec extends SparkTestBase {

  private lazy val fixturePath =
    getClass.getResource("/dblp_fixture.txt").getPath

  test("readLineXml → t1 over the golden fixture") {
    val pubs = Dblp.readLineXml(spark, fixturePath)
    pubs.count() shouldBe 12L
    val t1 = rows(DblpQueries.t1TopAuthorsPerVenue(pubs, k = 2))
    t1 shouldBe Seq(
      Seq("BadJ", "NoYear", 1L), // year filter is t2-only (reference parity)
      Seq("Comm, ACM", "Smith, John", 1L), // Q1: comma names intact
      Seq("MIT", "Heidi", 1L),
      Seq("SIGMOD", "Bob", 1L), Seq("SIGMOD", "Carol", 1L), // k=2 eviction
      Seq("Springer", "Grace", 1L),
      Seq("TODS", "Alice", 3L), Seq("TODS", "Bob", 1L),
      Seq("VLDB", "Frank", 1L),               // editor fallback
      Seq("homepages/x/Alice", "Alice", 1L))  // www key-prefix venue
  }

  test("t2 finds Alice's 3-year streak; no-year record dropped") {
    val pubs = Dblp.readLineXml(spark, fixturePath)
    rows(DblpQueries.t2ConsecutiveYears(pubs, minStreak = 3)) shouldBe
      Seq(Seq("Alice", 3L))
  }

  test("typed Dataset facade exposes fields with compile-time safety") {
    import spark.implicits._
    val pubs = Dblp.readLineXmlTyped(spark, fixturePath)
    val alice = pubs.filter(_.authors.contains("Alice")).map(_.key).collect().sorted
    alice.toSeq shouldBe Seq("homepages/x/Alice/home", "journals/tods/A1",
      "journals/tods/A2", "journals/tods/A3")
    pubs.filter(_.years.isEmpty).map(_.key).collect().toSeq shouldBe
      Seq("homepages/x/Alice/home", "journals/bad/N1")
  }

  test("whole-file dblp.xml (native rowTag source) ≡ line-per-record path") {
    val wholePath = getClass.getResource("/dblp_fixture.xml").getPath
    val whole = rows(Dblp.readWholeXml(spark, wholePath)
      .orderBy("key", "recordType"))
    val line = rows(Dblp.readLineXml(spark, fixturePath)
      .orderBy("key", "recordType"))
    whole should have size 12
    whole shouldBe line
  }

  test("ISO-8859-1 charset: non-ASCII authors survive the whole-file path") {
    // dblp_fixture.xml is ISO-8859-1 on disk (ü = 0xFC, as in real dblp.xml);
    // without the charset option the XML source would decode it as UTF-8 and
    // mangle every non-ASCII name.
    val wholePath = getClass.getResource("/dblp_fixture.xml").getPath
    val authors = Dblp.readWholeXml(spark, wholePath)
      .where("key = 'journals/tods/U1'")
      .selectExpr("authors[0]", "title").collect().map(r => (r.getString(0), r.getString(1)))
    authors.toSeq shouldBe Seq(("Jürgen Müller", "Über Études"))
  }

  test("whole-file path feeds the same t1 result as the line path") {
    val wholePath = getClass.getResource("/dblp_fixture.xml").getPath
    rows(DblpQueries.t1TopAuthorsPerVenue(Dblp.readWholeXml(spark, wholePath), k = 2)) shouldBe
      rows(DblpQueries.t1TopAuthorsPerVenue(Dblp.readLineXml(spark, fixturePath), k = 2))
  }

  test("CSV sink round-trips with configurable separator (S4)") {
    val pubs = Dblp.readLineXml(spark, fixturePath)
    val out = java.nio.file.Files.createTempDirectory("graft-csv").toString
    Sinks.writeCsv(DblpQueries.t1TopAuthorsPerVenue(pubs, k = 2), s"$out/t1", sep = "|")
    val back = spark.read.option("sep", "|").option("header", "true").csv(s"$out/t1")
    back.count() shouldBe 10L
    back.columns.toSeq shouldBe Seq("venue", "author", "cnt")
  }
}
