package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** The reference's six queries (SURVEY.md §2.6) over the *native* DBLP
  * publication relation produced by [[graft.model.Dblp.normalize]]:
  * (key, recordType, venue, authors ARRAY<STRING>, title, years ARRAY<INT>).
  *
  * [[DblpAnalog]] instantiates the same operator DAGs over the driver star
  * schema; these are the reference-parity API a DBLP user would call.
  * Intended semantics where the reference has bugs (SURVEY.md Q2–Q5);
  * deterministic total orderings everywhere.
  */
object DblpQueries {

  /** P5 garbage filter (Homework2.scala:136,199,278,348,513). */
  private def clean(c: String) = col(c).isNotNull && col(c) =!= ""

  /** t1 (Homework2.scala:30-144): per venue, top-k authors by pub count. */
  def t1TopAuthorsPerVenue(pubs: DataFrame, k: Int = 10): DataFrame = {
    val counts = pubs
      .filter(clean("venue"))
      .select(col("venue"), explode(col("authors")).as("author"))
      .filter(clean("author"))
      .groupBy("venue", "author").agg(count(lit(1)).as("cnt"))
    Relational
      .topKPerGroup(counts, Seq(col("venue")), Seq(col("cnt").desc, col("author").asc), k)
      .orderBy(col("venue").asc, col("cnt").desc, col("author").asc)
  }

  /** t2 (Homework2.scala:146-228): authors whose longest consecutive-year run
    * ≥ minStreak (reference threshold 10). P3 year-arity guard applied here,
    * as in the reference's task-2 mapper. Duplicate years deduped (Q3
    * intended semantics); `strictReference = true` replays the reference's
    * duplicate-resets-the-streak quirk bit-for-bit from this same path
    * (two same-year pubs by one author then break a streak). */
  def t2ConsecutiveYears(pubs: DataFrame, minStreak: Int = 10,
                         strictReference: Boolean = false): DataFrame = {
    val ay = pubs
      .filter(size(col("years")) === 1) // P3: exactly one <year>
      .select(explode(col("authors")).as("author"), element_at(col("years"), 1).as("yr"))
      .filter(clean("author"))
    val runs =
      if (strictReference) Relational.longestRunPerKeyStrict(ay, col("author"), col("yr"))
      else Relational.longestRunPerKey(ay, col("author"), col("yr"))
    runs
      .toDF("author", "streak")
      .filter(col("streak") >= minStreak)
      .orderBy(col("streak").desc, col("author").asc)
  }

  /** t3 (Homework2.scala:230-282): per venue, '|'-joined titles of
    * single-author pubs (P4: size(authors)==1), titles sorted. */
  def t3SoloTitlesPerVenue(pubs: DataFrame): DataFrame =
    pubs
      .filter(size(col("authors")) === 1 && clean("venue") && clean("title"))
      .groupBy("venue")
      .agg(Relational.sortedStringAgg(col("title"), "|").as("titles"))
      .orderBy(col("venue").asc)

  /** t4 (Homework2.scala:283-366): per venue, title(s) tied for the max
    * author-list size — the *global* arg-max (Q5 fixed). */
  def t4MaxAuthorPubsPerVenue(pubs: DataFrame): DataFrame = {
    val withNa = pubs
      .filter(clean("venue") && clean("title"))
      .select(col("venue"), col("title"), size(col("authors")).as("na"))
      .filter(col("na") > 0)
    Relational.argMaxPerGroup(withNa, Seq(col("venue")), col("na"))
      .select(col("venue"), col("title"), col("na").as("n_authors"))
      .orderBy(col("venue").asc, col("title").asc)
  }

  /** t5 (Homework2.scala:368-445): top-k authors by Σ over their pubs of the
    * pub's author-list size (self included, duplicates kept — Q6 replicated;
    * the intended limit applied — Q4 fixed). */
  def t5TopCoauthorAuthors(pubs: DataFrame, k: Int = 100): DataFrame =
    pubs
      .select(explode(col("authors")).as("author"), size(col("authors")).as("na"))
      .filter(clean("author"))
      .groupBy("author").agg(sum("na").as("weight"))
      .orderBy(col("weight").desc, col("author").asc)
      .limit(k)

  /** t6 (Homework2.scala:447-519): top-k authors by pub count among authors
    * who never co-authored (every pub's author list has exactly one entry). */
  def t6TopSoloAuthors(pubs: DataFrame, k: Int = 100): DataFrame =
    pubs
      .select(explode(col("authors")).as("author"), size(col("authors")).as("na"))
      .filter(clean("author"))
      .groupBy("author")
      .agg(count(lit(1)).as("cnt"), max("na").as("maxco"))
      .filter(col("maxco") === 1)
      .select("author", "cnt")
      .orderBy(col("cnt").desc, col("author").asc)
      .limit(k)
}
