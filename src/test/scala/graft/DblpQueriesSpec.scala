package graft

import graft.queries.DblpQueries

/** Golden tests for the six reference queries over hand-built normalized
  * publication rows — covers the SURVEY.md §2.7 quirk branches the analog
  * star-schema data can't reach (t6 solo-exclusion, t1 eviction/ties, t4
  * cross-group ties, t2 duplicate-year streaks). */
class DblpQueriesSpec extends SparkTestBase {
  import spark.implicits._

  private def pub(key: String, venue: String, authors: Seq[String], title: String,
                  years: Seq[Int] = Seq(2000), recordType: String = "article") =
    (key, recordType, venue, authors, title, years)

  private def toPubs(ps: Seq[(String, String, String, Seq[String], String, Seq[Int])]) =
    ps.toDF("key", "recordType", "venue", "authors", "title", "years")

  test("t1: top-k per venue with eviction and name-asc tiebreak at the boundary") {
    // venue V: authors a1..a4 with counts 3,2,2,1 -> top-3 keeps a1,a2,a3 (a3 beats a4 on ties? no - a2/a3 tie at 2, a4=1)
    val ps = toPubs(Seq(
      pub("k1", "V", Seq("a1"), "t1"), pub("k2", "V", Seq("a1"), "t2"),
      pub("k3", "V", Seq("a1"), "t3"), pub("k4", "V", Seq("a2"), "t4"),
      pub("k5", "V", Seq("a2"), "t5"), pub("k6", "V", Seq("a3"), "t6"),
      pub("k7", "V", Seq("a3"), "t7"), pub("k8", "V", Seq("a4"), "t8"),
      pub("k9", "W", Seq("b1"), "t9"),
      pub("k10", "", Seq("gone"), "t10") // garbage venue filtered (P5)
    ))
    rows(DblpQueries.t1TopAuthorsPerVenue(ps, k = 3)) shouldBe Seq(
      Seq("V", "a1", 3L), Seq("V", "a2", 2L), Seq("V", "a3", 2L),
      Seq("W", "b1", 1L))
  }

  test("t2: duplicate years don't break a streak; 0/2-year records dropped") {
    val ps = toPubs(Seq(
      pub("k1", "V", Seq("alice"), "t", Seq(2000)),
      pub("k2", "V", Seq("alice"), "t", Seq(2001)),
      pub("k3", "V", Seq("alice"), "t", Seq(2001)), // dup year (Q3)
      pub("k4", "V", Seq("alice"), "t", Seq(2002)),
      pub("k5", "V", Seq("alice"), "t", Seq(2005)),
      pub("k6", "V", Seq("bob"), "t", Seq(2000)),
      pub("k7", "V", Seq("bob"), "t", Seq.empty),       // 0 years -> dropped (P3)
      pub("k8", "V", Seq("bob"), "t", Seq(2001, 2002)), // 2 years -> dropped (P3)
      pub("k9", "V", Seq("bob"), "t", Seq(2003))
    ))
    rows(DblpQueries.t2ConsecutiveYears(ps, minStreak = 3)) shouldBe Seq(
      Seq("alice", 3L)) // bob's valid years {2000, 2003} -> streak 1
    // Strict reference mode from the SAME query path: alice's duplicate 2001
    // resets the walk (2000,2001 | 2001,2002), so her best streak is 2 — the
    // reference's Q3 quirk, bit-for-bit.
    rows(DblpQueries.t2ConsecutiveYears(ps, minStreak = 2, strictReference = true)) shouldBe
      Seq(Seq("alice", 2L))
  }

  test("t3: solo titles sorted and '|'-joined per venue") {
    val ps = toPubs(Seq(
      pub("k1", "V", Seq("a"), "zz"),
      pub("k2", "V", Seq("b"), "aa"),
      pub("k3", "V", Seq("a", "b"), "not-solo"),
      pub("k4", "W", Seq("c"), "mm")
    ))
    rows(DblpQueries.t3SoloTitlesPerVenue(ps)) shouldBe Seq(
      Seq("V", "aa|zz"), Seq("W", "mm"))
  }

  test("t4: global arg-max keeps all tied titles (Q5 fixed)") {
    val ps = toPubs(Seq(
      pub("k1", "V", Seq("a", "b", "c"), "big1"),
      pub("k2", "V", Seq("d", "e", "f"), "big2"),
      pub("k3", "V", Seq("a"), "small"),
      pub("k4", "W", Seq("x"), "only")
    ))
    rows(DblpQueries.t4MaxAuthorPubsPerVenue(ps)) shouldBe Seq(
      Seq("V", "big1", 3), Seq("V", "big2", 3), Seq("W", "only", 1))
  }

  test("t5: co-author weight includes self and repeats (Q6), intended limit (Q4)") {
    val ps = toPubs(Seq(
      pub("k1", "V", Seq("a", "b"), "t"),      // a+=2, b+=2
      pub("k2", "V", Seq("a", "b", "c"), "t"), // a+=3, b+=3, c+=3
      pub("k3", "V", Seq("a"), "t")            // a+=1
    ))
    rows(DblpQueries.t5TopCoauthorAuthors(ps, k = 2)) shouldBe Seq(
      Seq("a", 6L), Seq("b", 5L))
  }

  test("t6: an author with any co-authored pub is excluded entirely") {
    val ps = toPubs(Seq(
      pub("k1", "V", Seq("solo1"), "t"), pub("k2", "V", Seq("solo1"), "t"),
      pub("k3", "V", Seq("solo2"), "t"),
      pub("k4", "V", Seq("mixed"), "t"),          // solo pub...
      pub("k5", "V", Seq("mixed", "other"), "t")  // ...but co-authored once -> excluded
    ))
    rows(DblpQueries.t6TopSoloAuthors(ps, k = 10)) shouldBe Seq(
      Seq("solo1", 2L), Seq("solo2", 1L))
  }
}
