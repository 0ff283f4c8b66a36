package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Lake

/** The SQL write path for lake tables (GraftSqlParser via injectParser):
  * MERGE INTO / UPDATE / DELETE FROM / OPTIMIZE / VACUUM over
  * graft_lake('<root>'), the clause matrix, alias handling, delegation of
  * every non-lake statement, and the refusal surface. */
class LakeSqlDmlSpec extends SparkTestBase {
  import spark.implicits._

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

  private def mkTable(s: SparkSession) = {
    import s.implicits._
    val df = (1L to 90L).map(k => (k, s"val$k", "A", k * 10.0))
      .toDF("k", "payload", "status", "amount")
    Lake.create(s, Lake.freshRoot(), df, "k", 3)
  }

  test("MERGE INTO: full clause matrix with statement aliases") {
    withExtendedSession { s =>
      import s.implicits._
      val t = mkTable(s)
      Seq((5L, "DEL", "D", 0.0), (42L, "UPD", "U", 1.0),
        (61L, "NOPE", "N", 2.0), (200L, "INS", "I", 3.0))
        .toDF("k", "payload", "status", "amount")
        .createOrReplaceTempView("dml_src")
      val stats = s.sql(
        s"""MERGE INTO graft_lake('${t.root}') AS tgt
           |USING dml_src AS src
           |ON tgt.k = src.k
           |WHEN MATCHED AND src.status = 'D' THEN DELETE
           |WHEN MATCHED AND src.status = 'U' THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      stats.head.getInt(0) shouldBe 1 // version
      val r = t.read()
      r.count() shouldBe 90L // -1 delete +1 insert
      r.filter(col("k") === 5L).count() shouldBe 0L
      rows(r.filter(col("k") === 42L).select("payload")) shouldBe Seq(Seq("UPD"))
      rows(r.filter(col("k") === 61L).select("payload")) shouldBe Seq(Seq("val61"))
      rows(r.filter(col("k") === 200L).select("payload")) shouldBe Seq(Seq("INS"))
    }
  }

  test("MERGE INTO: subquery source, no aliases, plain upsert clauses") {
    withExtendedSession { s =>
      import s.implicits._
      val t = mkTable(s)
      Seq((7L, "UP7", "U", 0.0), (300L, "NEW", "I", 1.0))
        .toDF("k", "payload", "status", "amount")
        .createOrReplaceTempView("dml_src2")
      s.sql(
        s"""MERGE INTO graft_lake('${t.root}')
           |USING (SELECT * FROM dml_src2 WHERE k <> 9999) ON k = k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      rows(t.read().filter(col("k").isin(7L, 300L))
        .select("k", "payload").orderBy("k")) shouldBe
        Seq(Seq(7L, "UP7"), Seq(300L, "NEW"))
      t.read().count() shouldBe 91L
    }
  }

  test("UPDATE: simultaneous assignments against the OLD row, WHERE scoping") {
    withExtendedSession { s =>
      val t = mkTable(s)
      // swap-style: both RHS reference pre-update values
      s.sql(
        s"""UPDATE graft_lake('${t.root}') AS t
           |SET payload = t.status, status = t.payload, amount = t.amount + 1
           |WHERE t.k <= 3""".stripMargin).collect()
      rows(t.read().filter(col("k") <= 3L)
        .select("k", "payload", "status", "amount").orderBy("k")) shouldBe
        Seq(Seq(1L, "A", "val1", 11.0), Seq(2L, "A", "val2", 21.0),
          Seq(3L, "A", "val3", 31.0))
      t.read().filter(col("payload") === "A").count() shouldBe 3L
      // an UPDATE matching nothing commits nothing
      val v = t.latestVersion
      s.sql(s"UPDATE graft_lake('${t.root}') SET status = 'X' WHERE k > 1000")
        .collect()
      t.latestVersion shouldBe v
    }
  }

  test("DELETE FROM: non-key predicate, and unconditioned full wipe") {
    withExtendedSession { s =>
      val t = mkTable(s)
      s.sql(s"DELETE FROM graft_lake('${t.root}') WHERE amount > 600.0")
        .collect()
      t.read().count() shouldBe 60L
      t.read().agg(max("k")).collect()(0).getLong(0) shouldBe 60L
      // snapshot isolation: pre-delete version intact
      t.snapshot(0).count() shouldBe 90L
      s.sql(s"DELETE FROM graft_lake('${t.root}')").collect()
      t.read().count() shouldBe 0L
    }
  }

  test("OPTIMIZE: FILES, SORT BY, n-column ZORDER BY; VACUUM RETAIN") {
    withExtendedSession { s =>
      val t = mkTable(s)
      s.sql(s"OPTIMIZE graft_lake('${t.root}') FILES 2").collect()
      t.manifest(t.latestVersion).files should have size 2
      s.sql(s"OPTIMIZE graft_lake('${t.root}') FILES 3 SORT BY (status, payload)")
        .collect()
      t.manifest(t.latestVersion).operation should include("sortby")
      s.sql(s"OPTIMIZE graft_lake('${t.root}') FILES 4 ZORDER BY (k, amount, status)")
        .collect()
      t.manifest(t.latestVersion).operation shouldBe "optimize-zorder-3d"
      t.read().count() shouldBe 90L
      s.sql(s"OPTIMIZE graft_lake('${t.root}') FILES 4 HILBERT BY (k, amount)")
        .collect()
      t.manifest(t.latestVersion).operation shouldBe "optimize-hilbert-2d"
      t.read().count() shouldBe 90L
      val vac = s.sql(s"VACUUM graft_lake('${t.root}') RETAIN 1 VERSIONS")
        .collect()
      vac.head.getInt(0) should be > 0 // manifests removed
      t.hasVersion(0) shouldBe false
      t.read().count() shouldBe 90L
    }
  }

  test("MERGE works through outstanding tombstones from SQL too") {
    withExtendedSession { s =>
      import s.implicits._
      val t = mkTable(s)
      t.deleteDeferred(Seq(5L, 6L).toDF("k"))
      Seq((5L, "BACK5", "U", 0.0)).toDF("k", "payload", "status", "amount")
        .createOrReplaceTempView("dml_src3")
      s.sql(
        s"""MERGE INTO graft_lake('${t.root}') t USING dml_src3 s
           |ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      rows(t.read().filter(col("k") === 5L).select("payload")) shouldBe
        Seq(Seq("BACK5"))
      t.read().filter(col("k") === 6L).count() shouldBe 0L
    }
  }

  test("refusals: mis-ordered clauses, non-key ON, key assignment, bad grammar") {
    withExtendedSession { s =>
      val t = mkTable(s)
      // UPDATE clause before DELETE clause: the engine evaluates DELETE
      // first — reordering silently would change which clause wins
      val e1 = intercept[IllegalArgumentException] {
        s.sql(
          s"""MERGE INTO graft_lake('${t.root}') t USING x s ON t.k = s.k
             |WHEN MATCHED AND s.a = 1 THEN UPDATE SET *
             |WHEN MATCHED AND s.a = 2 THEN DELETE""".stripMargin)
      }
      e1.getMessage should include("DELETE before UPDATE")
      // ON must be a key equality — enforced at run against the manifest
      val e2 = intercept[IllegalArgumentException] {
        s.sql(
          s"""MERGE INTO graft_lake('${t.root}') t USING x s ON t.payload = s.payload
             |WHEN MATCHED THEN UPDATE SET *""".stripMargin).collect()
      }
      e2.getMessage should include("merge key")
      // assigning the merge key in UPDATE
      val e3 = intercept[IllegalArgumentException] {
        s.sql(s"UPDATE graft_lake('${t.root}') SET k = 0 WHERE k = 1").collect()
      }
      e3.getMessage should include("merge key")
      // assigning a column the table doesn't have (withColumns would
      // silently ADD it)
      val e3b = intercept[IllegalArgumentException] {
        s.sql(s"UPDATE graft_lake('${t.root}') SET no_such = 1 WHERE k = 1")
          .collect()
      }
      e3b.getMessage should include("unknown column")
      // assigning the merge key in a per-column MERGE SET (parse-time:
      // the key is known from the ON clause)
      val e4 = intercept[IllegalArgumentException] {
        s.sql(
          s"""MERGE INTO graft_lake('${t.root}') t USING x s ON t.k = s.k
             |WHEN MATCHED THEN UPDATE SET t.k = s.k + 1""".stripMargin)
      }
      e4.getMessage should include("merge key")
      // a NOT MATCHED condition has no target row to reference
      val e5 = intercept[IllegalArgumentException] {
        s.sql(
          s"""MERGE INTO graft_lake('${t.root}') t USING x s ON t.k = s.k
             |WHEN NOT MATCHED AND t.amount > 1 THEN INSERT *""".stripMargin)
      }
      e5.getMessage should include("only the source")
      // a NOT MATCHED BY SOURCE condition has no source row to reference
      val e6 = intercept[IllegalArgumentException] {
        s.sql(
          s"""MERGE INTO graft_lake('${t.root}') t USING x s ON t.k = s.k
             |WHEN NOT MATCHED BY SOURCE AND s.amount > 1 THEN DELETE""".stripMargin)
      }
      e6.getMessage should include("only the target")
      // the assignment target must be a target column, not source-qualified
      val e7 = intercept[IllegalArgumentException] {
        s.sql(
          s"""MERGE INTO graft_lake('${t.root}') t USING x s ON t.k = s.k
             |WHEN MATCHED THEN UPDATE SET s.payload = 'x'""".stripMargin)
      }
      e7.getMessage should include("target table")
    }
  }

  test("MERGE: per-column SET, conditional INSERT, NOT MATCHED BY SOURCE DELETE") {
    withExtendedSession { s =>
      import s.implicits._
      val t = mkTable(s) // keys 1..90, payload valK, status A, amount k*10
      Seq((10L, "P10", "S", 5.0), (20L, "P20", "S", 5.0),
        (200L, "NEW", "S", 1.0), (300L, "BIG", "S", 999.0))
        .toDF("k", "payload", "status", "amount")
        .createOrReplaceTempView("full_src")
      val stats = s.sql(
        s"""MERGE INTO graft_lake('${t.root}') AS tgt
           |USING full_src AS src ON tgt.k = src.k
           |WHEN MATCHED AND tgt.k = 10 THEN
           |  UPDATE SET payload = src.payload, amount = tgt.amount + src.amount
           |WHEN NOT MATCHED AND src.amount < 100.0 THEN INSERT *
           |WHEN NOT MATCHED BY SOURCE AND tgt.k > 88 THEN DELETE""".stripMargin)
        .collect()(0)
      // NMBS rewrite is TARGETED: source keys hit the low file, the
      // condition (k > 88) fires only in the high file — the middle file
      // carries by reference
      stats.getInt(1) shouldBe 1 // kept_files
      stats.getInt(2) shouldBe 2 // rewritten_files
      val r = t.read()
      // per-column update: payload/amount assigned, status carried
      rows(r.filter(col("k") === 10L)
        .select("payload", "status", "amount")) shouldBe
        Seq(Seq("P10", "A", 105.0))
      // matched but condition false: row untouched
      rows(r.filter(col("k") === 20L).select("payload")) shouldBe
        Seq(Seq("val20"))
      // conditional insert: 200 (amount 1.0) in, 300 (999.0) out
      r.filter(col("k") === 200L).count() shouldBe 1L
      r.filter(col("k") === 300L).count() shouldBe 0L
      // NOT MATCHED BY SOURCE: 89 and 90 (k > 88, no source match) deleted
      r.filter(col("k") > 88L && col("k") < 100L).count() shouldBe 0L
      r.count() shouldBe 89L // 90 - 2 NMBS + 1 insert
    }
  }

  test("MERGE: NOT MATCHED BY SOURCE UPDATE marks stale rows per-column") {
    withExtendedSession { s =>
      import s.implicits._
      val t = mkTable(s) // keys 1..90, status A
      // the source carries only keys 1..10: everything else is "stale"
      (1L to 10L).map(k => (k, s"keep$k", "K", 1.0))
        .toDF("k", "payload", "status", "amount")
        .createOrReplaceTempView("recon_src")
      val stats = s.sql(
        s"""MERGE INTO graft_lake('${t.root}') t USING recon_src s
           |ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED BY SOURCE AND t.k <= 40 THEN DELETE
           |WHEN NOT MATCHED BY SOURCE AND t.k > 60
           |  THEN UPDATE SET status = 'STALE'""".stripMargin).collect()(0)
      val r = t.read()
      // matched: replaced; 11..40 deleted; 41..60 carried; 61..90 marked
      r.count() shouldBe 60L // 10 + 20 + 30
      rows(r.filter(col("k") === 5L).select("payload")) shouldBe
        Seq(Seq("keep5"))
      r.filter(col("k").between(11L, 40L)).count() shouldBe 0L
      rows(r.filter(col("k") === 50L).select("status")) shouldBe Seq(Seq("A"))
      r.filter(col("status") === "STALE").count() shouldBe 30L
      rows(r.filter(col("k") === 70L).select("payload", "status")) shouldBe
        Seq(Seq("val70", "STALE")) // other columns carried from the target
      // mis-ordered NMBS clauses refuse (DELETE evaluates first)
      intercept[IllegalArgumentException] {
        s.sql(
          s"""MERGE INTO graft_lake('${t.root}') t USING recon_src s ON t.k = s.k
             |WHEN NOT MATCHED BY SOURCE AND t.k > 60 THEN UPDATE SET status = 'X'
             |WHEN NOT MATCHED BY SOURCE AND t.k <= 40 THEN DELETE""".stripMargin)
      }.getMessage should include("DELETE clause first")
      // a source-referencing NMBS assignment refuses
      intercept[IllegalArgumentException] {
        s.sql(
          s"""MERGE INTO graft_lake('${t.root}') t USING recon_src s ON t.k = s.k
             |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = s.status""".stripMargin)
      }.getMessage should include("only the target")
      // SET * is impossible without a source row
      intercept[IllegalArgumentException] {
        s.sql(
          s"""MERGE INTO graft_lake('${t.root}') t USING recon_src s ON t.k = s.k
             |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *""".stripMargin)
      }.getMessage should include("per-column")
    }
  }

  test("MERGE: per-column SET accepts a NARROW source when inserts are off") {
    withExtendedSession { s =>
      import s.implicits._
      val t = mkTable(s)
      // only the key and the assignment input — no full row
      Seq((3L, 777.0), (4L, 888.0), (500L, 1.0)).toDF("k", "new_amount")
        .createOrReplaceTempView("narrow_src")
      s.sql(
        s"""MERGE INTO graft_lake('${t.root}') t USING narrow_src s
           |ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET amount = s.new_amount""".stripMargin)
        .collect()
      rows(t.read().filter(col("k").isin(3L, 4L))
        .select("k", "payload", "amount").orderBy("k")) shouldBe
        Seq(Seq(3L, "val3", 777.0), Seq(4L, "val4", 888.0))
      // the unmatched narrow key neither inserted nor failed
      t.read().filter(col("k") === 500L).count() shouldBe 0L
      t.read().count() shouldBe 90L
      // per-column merges never evolve the schema: new_amount is no column
      t.read().columns should not contain "new_amount"
    }
  }

  test("scanner: double-quoted strings and block comments never mis-structure") {
    withExtendedSession { s =>
      val t = mkTable(s)
      // a double-quoted literal containing '--' must not scan as a comment
      s.sql(
        s"""UPDATE graft_lake('${t.root}') SET payload = "a--b" WHERE k = 1""")
        .collect()
      rows(t.read().filter(col("k") === 1L).select("payload")) shouldBe
        Seq(Seq("a--b"))
      // a double-quoted string with ',' and ')' inside an IN list
      s.sql(
        s"""UPDATE graft_lake('${t.root}') SET status = 'Z'
           |WHERE payload IN ("a,b", 'c)d', "a--b")""".stripMargin).collect()
      t.read().filter(col("status") === "Z").count() shouldBe 1L
      // a block comment containing ';' in a WHERE tail must not truncate
      s.sql(
        s"""DELETE FROM graft_lake('${t.root}')
           |WHERE /* not a terminator: ; */ amount > 880.0""".stripMargin)
        .collect()
      t.read().count() shouldBe 88L // amount k*10 > 880 → keys 89 and 90
      // a semicolon INSIDE a single-quoted string survives restStmt
      s.sql(
        s"""UPDATE graft_lake('${t.root}') SET payload = 'x;y' WHERE k = 2""")
        .collect()
      rows(t.read().filter(col("k") === 2L).select("payload")) shouldBe
        Seq(Seq("x;y"))
    }
  }

  test("ALTER TABLE: RENAME/DROP COLUMN are metadata-only and SQL-visible") {
    withExtendedSession { s =>
      val t = mkTable(s) // k, payload, status, amount
      val files0 = t.manifest(0).files.map(_.path).toSet
      s.sql(s"ALTER TABLE graft_lake('${t.root}') RENAME COLUMN payload TO note")
        .collect()
      s.sql(s"ALTER TABLE graft_lake('${t.root}') DROP COLUMN amount")
        .collect()
      // zero data movement across both commits
      t.manifest(t.latestVersion).files.map(_.path).toSet shouldBe files0
      // SQL reads speak the new shape
      val r = s.sql(s"SELECT * FROM graft_lake('${t.root}') WHERE k = 1")
        .collect()(0)
      r.schema.fieldNames.toSeq shouldBe Seq("k", "note", "status")
      r.getString(1) shouldBe "val1"
      // time travel recovers the OLD shape
      s.sql(s"SELECT * FROM graft_lake('${t.root}') VERSION AS OF 0 WHERE k = 1")
        .collect()(0).schema.fieldNames.toSeq shouldBe
        Seq("k", "payload", "status", "amount")
      // DML through the new name
      s.sql(s"UPDATE graft_lake('${t.root}') SET note = 'SQL1' WHERE k = 1")
        .collect()
      s.sql(s"SELECT note FROM graft_lake('${t.root}') WHERE k = 1")
        .collect()(0).getString(0) shouldBe "SQL1"
      // ALTER on a non-lake table delegates to the default parser
      intercept[Exception] {
        s.sql("ALTER TABLE no_such_t RENAME COLUMN a TO b").collect()
      }.getMessage should not include "graft lake SQL"
    }
  }

  test("ALTER TABLE ADD COLUMN: metadata-only schema growth from SQL") {
    withExtendedSession { s =>
      val t = mkTable(s) // k, payload, status, amount
      val files0 = t.manifest(0).files.map(_.path).toSet
      s.sql(s"ALTER TABLE graft_lake('${t.root}') ADD COLUMN score DOUBLE")
        .collect()
      // zero data movement; old files read the column as null
      t.manifest(t.latestVersion).files.map(_.path).toSet shouldBe files0
      val r = s.sql(s"SELECT * FROM graft_lake('${t.root}') WHERE k = 1")
        .collect()(0)
      r.schema.fieldNames.toSeq shouldBe
        Seq("k", "payload", "status", "amount", "score")
      r.isNullAt(4) shouldBe true
      // complex types normalize through the delegate's type grammar
      s.sql(s"ALTER TABLE graft_lake('${t.root}') ADD COLUMN tags ARRAY<STRING>")
        .collect()
      s.sql(s"SELECT tags FROM graft_lake('${t.root}') WHERE k = 1")
        .collect()(0).isNullAt(0) shouldBe true
      // DML can fill it; time travel keeps the pre-DDL shape
      s.sql(s"UPDATE graft_lake('${t.root}') SET score = 9.5 WHERE k = 2")
        .collect()
      s.sql(s"SELECT score FROM graft_lake('${t.root}') WHERE k = 2")
        .collect()(0).getDouble(0) shouldBe 9.5
      s.sql(s"SELECT * FROM graft_lake('${t.root}') VERSION AS OF 0 WHERE k = 1")
        .collect()(0).schema.fieldNames.toSeq shouldBe
        Seq("k", "payload", "status", "amount")
      // drop → SQL re-add reserves the old bytes (fresh physical storage)
      s.sql(s"ALTER TABLE graft_lake('${t.root}') DROP COLUMN status").collect()
      s.sql(s"ALTER TABLE graft_lake('${t.root}') ADD COLUMN status STRING")
        .collect()
      t.manifest(t.latestVersion).columnMap.get("status") shouldBe
        Some("status_2")
      s.sql(s"SELECT count(*) FROM graft_lake('${t.root}') " +
        "WHERE status IS NOT NULL").collect()(0).getLong(0) shouldBe 0L
      // explicit widening DDL: INT-ish columns promote in place
      s.sql(s"ALTER TABLE graft_lake('${t.root}') ALTER COLUMN score TYPE DOUBLE")
        .collect() // no-op (already double) — parses and resolves
      intercept[Exception] {
        s.sql(s"ALTER TABLE graft_lake('${t.root}') ALTER COLUMN payload " +
          "TYPE INT").collect()
      }.getMessage should include("WIDEN")
      // refusals: duplicate, bad type
      intercept[Exception] {
        s.sql(s"ALTER TABLE graft_lake('${t.root}') ADD COLUMN k BIGINT")
          .collect()
      }.getMessage should include("already exists")
      intercept[Exception] {
        s.sql(s"ALTER TABLE graft_lake('${t.root}') ADD COLUMN z NOTATYPE")
          .collect()
      }
    }
  }

  test("scanner: escaped quotes inside literals never mis-structure") {
    withExtendedSession { s =>
      val t = mkTable(s)
      // backslash-escaped quote carrying a ';' and a ',' in its tail —
      // the old scanner mis-terminated at the escape and split there
      s.sql(s"UPDATE graft_lake('${t.root}') SET payload = 'it\\'s; a, (test)' " +
        "WHERE k = 1").collect()
      s.sql(s"SELECT payload FROM graft_lake('${t.root}') WHERE k = 1")
        .collect()(0).getString(0) shouldBe "it's; a, (test)"
      // doubled-quote escape form, same hazard
      s.sql(s"UPDATE graft_lake('${t.root}') SET payload = 'she''s; ok' " +
        "WHERE k = 2").collect()
      s.sql(s"SELECT payload FROM graft_lake('${t.root}') WHERE k = 2")
        .collect()(0).getString(0) shouldBe "she's; ok"
      // a per-column MERGE assignment whose literal hides a top-level
      // comma — the assignment split must not break on it
      s.sql(
        s"""MERGE INTO graft_lake('${t.root}') USING
           |(SELECT 3L AS k) src ON k = k
           |WHEN MATCHED THEN UPDATE SET payload = 'a, b; c\\'d', status = 'E'
           |""".stripMargin).collect()
      val r = s.sql(s"SELECT payload, status FROM graft_lake('${t.root}') " +
        "WHERE k = 3").collect()(0)
      r.getString(0) shouldBe "a, b; c'd"
      r.getString(1) shouldBe "E"
    }
  }

  test("native time-travel syntax: VERSION AS OF / TIMESTAMP AS OF / bare") {
    withExtendedSession { s =>
      val t = mkTable(s) // v0
      s.sql(s"DELETE FROM graft_lake('${t.root}') WHERE k <= 30").collect()
      // VERSION AS OF pins the pre-delete snapshot
      s.sql(s"SELECT count(*) AS n FROM graft_lake('${t.root}') VERSION AS OF 0")
        .collect()(0).getLong(0) shouldBe 90L
      // bare graft_lake('root') reads the LATEST snapshot
      s.sql(s"SELECT count(*) AS n FROM graft_lake('${t.root}')")
        .collect()(0).getLong(0) shouldBe 60L
      // TIMESTAMP AS OF resolves by wall clock from the commit timestamps
      val ts0 = t.history().filter(col("version") === 0)
        .select("commit_ts").collect()(0).getLong(0)
      s.sql(
        s"""SELECT count(*) AS n FROM graft_lake('${t.root}')
           |TIMESTAMP AS OF '$ts0'""".stripMargin)
        .collect()(0).getLong(0) shouldBe 90L
      // the suffix works inside joins/subqueries, and a trailing alias
      // that merely SPELLS version is not mistaken for the suffix
      s.sql(
        s"""SELECT count(*) AS n
           |FROM graft_lake('${t.root}') VERSION AS OF 0 v0
           |JOIN graft_lake('${t.root}') cur ON v0.k = cur.k""".stripMargin)
        .collect()(0).getLong(0) shouldBe 60L
      s.sql(s"SELECT count(*) AS n FROM graft_lake('${t.root}') version")
        .collect()(0).getLong(0) shouldBe 60L
      // a non-literal AS OF argument refuses loudly
      val e = intercept[Exception] {
        s.sql(s"SELECT * FROM graft_lake('${t.root}') VERSION AS OF (1+1)")
      }
      e.getMessage should include("integer")
      // a string mentioning the token is untouched
      s.sql("SELECT 'graft_lake(''x'') VERSION AS OF 1' AS lit")
        .collect()(0).getString(0) should include("VERSION AS OF")
    }
  }

  test("CHECK constraints: enforced inside every write, metadata-only lifecycle") {
    withExtendedSession { s =>
      import s.implicits._
      val t = mkTable(s) // k 1..90, amount = k*10 (all positive)
      val files0 = t.manifest(0).files.map(_.path).toSet
      s.sql(s"ALTER TABLE graft_lake('${t.root}') " +
        "ADD CONSTRAINT amount_pos CHECK (amount > 0)").collect()
      // metadata-only: zero data movement
      t.manifest(t.latestVersion).files.map(_.path).toSet shouldBe files0
      // a violating INSERT fails the WRITE with the constraint's name
      Seq((500L, "bad", "B", -5.0)).toDF("k", "payload", "status", "amount")
        .createOrReplaceTempView("bad_ins")
      val e1 = intercept[Exception] {
        s.sql(s"INSERT INTO graft_lake('${t.root}') SELECT * FROM bad_ins")
          .collect()
      }
      e1.getMessage should include("amount_pos")
      t.read().count() shouldBe 90L
      // a violating per-column MERGE assignment fails too
      Seq((5L, 1.0)).toDF("k", "delta").createOrReplaceTempView("bad_upd")
      val e2 = intercept[Exception] {
        s.sql(
          s"""MERGE INTO graft_lake('${t.root}') t USING bad_upd u ON t.k = u.k
             |WHEN MATCHED THEN UPDATE SET amount = -u.delta""".stripMargin)
          .collect()
      }
      e2.getMessage should include("amount_pos")
      // a violating UPDATE fails; a conforming one lands
      intercept[Exception] {
        s.sql(s"UPDATE graft_lake('${t.root}') SET amount = -1 WHERE k = 1")
          .collect()
      }.getMessage should include("amount_pos")
      s.sql(s"UPDATE graft_lake('${t.root}') SET amount = 77 WHERE k = 1")
        .collect()
      t.read().filter(col("k") === 1L).select("amount")
        .collect()(0).getDouble(0) shouldBe 77.0
      // NULL passes (SQL CHECK semantics): a null-amount row inserts
      s.sql(
        s"""INSERT INTO graft_lake('${t.root}')
           |SELECT 600L AS k, 'n' AS payload, 'N' AS status,
           |       CAST(NULL AS DOUBLE) AS amount""".stripMargin).collect()
      t.read().filter(col("k") === 600L).count() shouldBe 1L
      // adding a constraint the EXISTING table violates refuses
      intercept[Exception] {
        s.sql(s"ALTER TABLE graft_lake('${t.root}') " +
          "ADD CONSTRAINT impossible CHECK (k < 10)").collect()
      }.getMessage should include("existing rows violate")
      // a column referenced by a constraint cannot rename or drop
      intercept[Exception] {
        s.sql(s"ALTER TABLE graft_lake('${t.root}') " +
          "RENAME COLUMN amount TO money").collect()
      }.getMessage should include("amount_pos")
      // DROP CONSTRAINT re-opens the gate
      s.sql(s"ALTER TABLE graft_lake('${t.root}') DROP CONSTRAINT amount_pos")
        .collect()
      s.sql(s"UPDATE graft_lake('${t.root}') SET amount = -1 WHERE k = 2")
        .collect()
      t.read().filter(col("amount") < 0).count() shouldBe 1L
    }
  }

  test("ANALYZE: retrofit stats without moving data; pruning activates") {
    withExtendedSession { s =>
      import s.implicits._
      // v correlates with the key layout, but carries NO stats at create
      val df = (1L to 90L).map(k => (k, k * 2, s"v$k")).toDF("k", "v", "payload")
      val t = Lake.create(s, Lake.freshRoot(), df, "k", 3)
      def scanned(q: org.apache.spark.sql.DataFrame): Long =
        q.select(input_file_name()).distinct().count()
      // before: a v-filter reads every covering file (no bounds to skip on)
      // (rows from only one file match, but the PLAN scans all three —
      // check via the manifest-prune rule's effect on inputFiles)
      val files0 = t.manifest(0).files.map(_.path).toSet
      val stats = s.sql(s"ANALYZE TABLE graft_lake('${t.root}') " +
        "COMPUTE STATISTICS FOR COLUMNS v, payload").collect()(0)
      // zero data movement: same physical files, new manifest entries
      t.manifest(t.latestVersion).files.map(_.path).toSet shouldBe files0
      t.manifest(t.latestVersion).statsCols should contain allOf ("v", "payload")
      t.manifest(t.latestVersion).files.foreach { f =>
        f.cols.keySet should contain("v")
        f.scols.keySet should contain("payload")
        f.nulls.keySet should contain allOf ("v", "payload")
      }
      // pruning on the retrofitted column: only the covering file scans
      scanned(t.read().filter(col("v") <= 20L)) shouldBe 1L
      t.read().filter(col("v") <= 20L).count() shouldBe 10L
      // string bounds prune equality predicates too
      t.read().filter(col("payload") === "v5").count() shouldBe 1L
      // content untouched
      t.read().count() shouldBe 90L
      // unknown column refuses
      intercept[Exception] {
        s.sql(s"ANALYZE TABLE graft_lake('${t.root}') " +
          "COMPUTE STATISTICS FOR COLUMNS nope").collect()
      }.getMessage should include("unknown column")
    }
  }

  test("ANALYZE ... WHERE: scoped retrofit covers only selected files") {
    withExtendedSession { s =>
      import s.implicits._
      val df = (1L to 90L).map(k => (k, k * 2, s"v$k")).toDF("k", "v", "payload")
      val t = Lake.create(s, Lake.freshRoot(), df, "k", 3) // key files 1-30/31-60/61-90
      // scope to the first file's key range: only it gets v-bounds
      s.sql(s"ANALYZE TABLE graft_lake('${t.root}') " +
        "COMPUTE STATISTICS FOR COLUMNS v WHERE k <= 30").collect()
      val m = t.manifest(t.latestVersion)
      m.statsCols should contain("v")
      val covered = m.files.filter(_.cols.keySet.contains("v"))
      covered should have size 1
      covered.head.minKey shouldBe 1L
      // pruning on the covered subset fires; uncovered files stay
      // conservative (scanned, never skipped — correctness over I/O)
      def scanned(q: org.apache.spark.sql.DataFrame): Long =
        q.select(input_file_name()).distinct().count()
      scanned(t.read().filter(col("v") <= 20L)) shouldBe 1L
      t.read().filter(col("v") <= 20L).count() shouldBe 10L
      // a v-range that lives ONLY in uncovered files still answers right
      t.read().filter(col("v") > 130L).count() shouldBe 25L
      // content untouched; a predicate selecting nothing commits nothing
      t.read().count() shouldBe 90L
      val v0 = t.latestVersion
      s.sql(s"ANALYZE TABLE graft_lake('${t.root}') " +
        "COMPUTE STATISTICS FOR COLUMNS payload WHERE k > 1000").collect()
      t.latestVersion shouldBe v0
    }
  }

  test("graft_lake_detail + VACUUM OLDER THAN: admin surface by wall clock") {
    withExtendedSession { s =>
      val t = mkTable(s) // v0: 90 rows, 3 files
      t.renameColumn("payload", "note")
      t.addConstraint("amt_pos", "amount > 0.0")
      // DESCRIBE DETAIL from SQL: one metadata-only row
      val d = s.sql(s"SELECT * FROM graft_lake_detail('${t.root}')")
        .collect()(0)
      d.getAs[Int]("version") shouldBe 2
      d.getAs[String]("key_col") shouldBe "k"
      d.getAs[Int]("n_files") shouldBe 3
      d.getAs[Long]("n_rows") shouldBe 90L
      d.getAs[String]("renamed_columns") shouldBe "note<-payload"
      d.getAs[String]("check_constraints") should include("amt_pos")
      // wall-clock retention: everything older than v2's commit drops,
      // v2 (the snapshot current at that moment) stays resolvable
      val ts2 = t.history().filter(col("version") === 2)
        .select("commit_ts").collect()(0).getLong(0)
      val dry = s.sql(
        s"VACUUM graft_lake('${t.root}') OLDER THAN '$ts2' DRY RUN")
        .collect()(0)
      dry.getInt(0) shouldBe 2 // v0, v1 manifests would drop
      t.hasVersion(0) shouldBe true // dry run mutated nothing
      s.sql(s"VACUUM graft_lake('${t.root}') OLDER THAN '$ts2'").collect()
      t.hasVersion(0) shouldBe false
      t.hasVersion(2) shouldBe true
      t.read().count() shouldBe 90L
      // a moment before the earliest retained commit is a no-op
      val r0 = s.sql(s"VACUUM graft_lake('${t.root}') OLDER THAN '0'")
        .collect()(0)
      (r0.getInt(0), r0.getInt(1)) shouldBe ((0, 0))
    }
  }

  test("RESTORE TABLE / SHALLOW CLONE: undo and branch from SQL") {
    withExtendedSession { s =>
      val t = mkTable(s) // v0: 90 rows, 3 files
      s.sql(s"UPDATE graft_lake('${t.root}') SET status = 'B' " +
        "WHERE k <= 30").collect() // v1
      s.sql(s"DELETE FROM graft_lake('${t.root}') WHERE k > 60").collect() // v2
      // branch the post-update snapshot zero-copy
      val cloneRoot = Lake.freshRoot() + "/c"
      val cs = s.sql(s"CREATE TABLE graft_lake('$cloneRoot') SHALLOW CLONE " +
        s"graft_lake('${t.root}') VERSION AS OF 1").collect()(0)
      cs.getInt(0) shouldBe 0 // the clone's own v0
      val c = new graft.sources.LakeTable(s, cloneRoot)
      c.read().count() shouldBe 90L
      c.read().filter(col("status") === "B").count() shouldBe 30L
      // roll the source back; history stays inspectable
      s.sql(s"RESTORE TABLE graft_lake('${t.root}') TO VERSION AS OF 0")
        .collect()(0).getInt(0) shouldBe 3
      t.read().count() shouldBe 90L
      t.read().filter(col("status") === "B").count() shouldBe 0L
      t.manifest(3).operation shouldBe "restore-v0"
      t.hasVersion(2) shouldBe true
      // wall-clock pin: restore to the moment v2 was current
      val ts2 = t.history().filter(col("version") === 2)
        .select("commit_ts").collect()(0).getLong(0)
      s.sql(s"RESTORE TABLE graft_lake('${t.root}') " +
        s"TO TIMESTAMP AS OF '$ts2'").collect()
      t.read().count() shouldBe 60L
      // the clone commits independently — the source never sees it
      s.sql(s"DELETE FROM graft_lake('$cloneRoot') WHERE k <= 45").collect()
      c.read().count() shouldBe 45L
      t.read().count() shouldBe 60L
      // refusals: RESTORE needs a pin; CLONE needs a lake source
      intercept[Exception] {
        s.sql(s"RESTORE TABLE graft_lake('${t.root}') TO").collect()
      }.getMessage should include("VERSION AS OF")
      intercept[Exception] {
        s.sql(s"CREATE TABLE graft_lake('$cloneRoot') SHALLOW CLONE " +
          "other_table").collect()
      }.getMessage should include("graft_lake")
    }
  }

  test("VACUUM DRY RUN: reports the sweep without mutating anything") {
    withExtendedSession { s =>
      val t = mkTable(s)
      s.sql(s"OPTIMIZE graft_lake('${t.root}') FILES 2").collect() // v1
      val manifestsBefore = (0 to t.latestVersion).count(t.hasVersion)
      val dry = s.sql(
        s"VACUUM graft_lake('${t.root}') RETAIN 1 VERSIONS DRY RUN")
        .collect()(0)
      dry.getInt(0) shouldBe 1 // would drop v0's manifest
      dry.getInt(1) should be > 0 // and its unreferenced data files
      // NOTHING moved: v0 still reads
      (0 to t.latestVersion).count(t.hasVersion) shouldBe manifestsBefore
      t.snapshot(0).count() shouldBe 90L
      // the real sweep then removes exactly what the dry run reported
      val real = s.sql(s"VACUUM graft_lake('${t.root}') RETAIN 1 VERSIONS")
        .collect()(0)
      real.getInt(0) shouldBe dry.getInt(0)
      real.getInt(1) shouldBe dry.getInt(1)
      t.hasVersion(0) shouldBe false
      t.read().count() shouldBe 90L
    }
  }

  test("OPTIMIZE WHERE: predicate-scoped compaction rewrites only touched files") {
    withExtendedSession { s =>
      import s.implicits._
      // a partitioned table: 3 partitions, fragmented by per-key merges
      val df = (1L to 90L).map(k => (k, k % 3, s"v$k")).toDF("k", "p", "payload")
      val t = Lake.create(s, Lake.freshRoot(), df, "k", 2,
        partitionBy = Seq("p"))
      (1L to 6L).foreach(k =>
        t.merge(Seq((k, k % 3, s"m$k")).toDF("k", "p", "payload")))
      val before = t.manifest(t.latestVersion).files
      val otherParts = before.filterNot(_.path.contains("p=1")).map(_.path).toSet
      // compact ONLY partition 1
      val stats = s.sql(
        s"OPTIMIZE graft_lake('${t.root}') FILES 1 WHERE p = 1").collect()(0)
      val after = t.manifest(t.latestVersion)
      // untouched partitions carry by reference
      otherParts.subsetOf(after.files.map(_.path).toSet) shouldBe true
      stats.getInt(2) should be > 0 // rewrote something
      after.files.count(_.path.contains("p=1")) shouldBe 1
      // content unchanged
      t.read().count() shouldBe 90L
      rows(t.read().filter(col("k") === 4L).select("payload")) shouldBe
        Seq(Seq("m4"))
      // an OPTIMIZE WHERE matching nothing commits nothing
      val v = t.latestVersion
      s.sql(s"OPTIMIZE graft_lake('${t.root}') WHERE p = 99").collect()
      t.latestVersion shouldBe v
      // layout + WHERE COMPOSE: re-cluster just the selected partition —
      // only p=1 files rewrite (sorted by payload, which joins the stats
      // set so the new files carry payload bounds), others carry
      val preCluster = after.files.filterNot(_.path.contains("p=1"))
        .map(_.path).toSet
      s.sql(s"OPTIMIZE graft_lake('${t.root}') FILES 2 " +
        s"SORT BY (payload) WHERE p = 1").collect()
      val m2 = t.manifest(t.latestVersion)
      m2.operation shouldBe "optimize-where-sort"
      preCluster.subsetOf(m2.files.map(_.path).toSet) shouldBe true
      m2.statsCols should contain("payload")
      val p1 = m2.files.filter(_.path.contains("p=1"))
      p1 should not be empty
      all(p1.map(_.scols.contains("payload"))) shouldBe true
      t.read().count() shouldBe 90L
    }
  }

  test("DELETE DEFERRED FROM: predicate MOR delete from SQL") {
    withExtendedSession { s =>
      val t = mkTable(s) // k, payload, status, amount; 3 files
      val files0 = t.manifest(0).files.map(_.path).toSet
      val r = s.sql(s"DELETE DEFERRED FROM graft_lake('${t.root}') " +
        "WHERE amount < 200.0").collect()(0)
      r.getInt(2) shouldBe 0 // zero rewrites
      val m = t.manifest(t.latestVersion)
      m.files.map(_.path).toSet shouldBe files0
      m.tombstones should have size 1
      s.sql(s"SELECT count(*) FROM graft_lake('${t.root}')")
        .collect()(0).getLong(0) shouldBe 71L // keys 1..19 dead (k*10 < 200)
      // alias form; stacking
      s.sql(s"DELETE DEFERRED FROM graft_lake('${t.root}') AS t " +
        "WHERE t.k = 50").collect()
      s.sql(s"SELECT count(*) FROM graft_lake('${t.root}')")
        .collect()(0).getLong(0) shouldBe 70L
      // a deferred wipe without WHERE refuses
      intercept[IllegalArgumentException] {
        s.sql(s"DELETE DEFERRED FROM graft_lake('${t.root}')")
      }.getMessage should include("WHERE")
    }
  }

  test("OPTIMIZE BINPACK SPLIT: oversized files split from SQL") {
    withExtendedSession { s =>
      val t = mkTable(s) // 90 rows, 3 files
      s.sql(s"OPTIMIZE graft_lake('${t.root}') FILES 1").collect()
      t.manifest(t.latestVersion).files should have size 1
      s.sql(s"OPTIMIZE graft_lake('${t.root}') BINPACK 5 TARGET 30 SPLIT 40")
        .collect()
      val m = t.manifest(t.latestVersion)
      m.files.count(_.rows > 40L) shouldBe 0
      m.files should have size 3 // ceil(90 / 30)
      t.read().count() shouldBe 90L
    }
  }

  test("UPDATE: case-insensitive assignment targets resolve to the schema's case") {
    withExtendedSession { s =>
      val t = mkTable(s)
      s.sql(s"UPDATE graft_lake('${t.root}') SET PAYLOAD = 'CASED' WHERE k = 7")
        .collect()
      rows(t.read().filter(col("k") === 7L).select("payload")) shouldBe
        Seq(Seq("CASED"))
      // schema itself did not grow a second casing
      t.read().columns.count(_.equalsIgnoreCase("payload")) shouldBe 1
    }
  }

  test("non-lake statements delegate untouched to the default parser") {
    withExtendedSession { s =>
      // ordinary SQL still parses and runs
      s.sql("SELECT 1 + 1 AS two").collect()(0).getInt(0) shouldBe 2
      // DML on a non-lake target goes to the DEFAULT parser's analysis,
      // not our grammar: the failure speaks Spark's vocabulary (missing
      // table), not graft's
      val e = intercept[Exception] {
        s.sql("DELETE FROM no_such_table WHERE x = 1").collect()
      }
      e.getMessage should not include "graft lake SQL"
      // a SELECT mentioning graft_lake table functions still works (the
      // read path is untouched)
      val t = mkTable(s)
      s.sql(s"SELECT count(*) AS n FROM graft_lake_at('${t.root}', 0)")
        .collect()(0).getLong(0) shouldBe 90L
    }
  }

  test("n-column Morton parity and clustering: ZValueN(2) == ZValue") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val a = rnd.nextLong().abs & 0x7fffffffL
      val b = rnd.nextLong().abs & 0x7fffffffL
      org.apache.spark.sql.graft.ZValue.interleaveN(Array(a, b)) shouldBe
        org.apache.spark.sql.graft.ZValue.interleave(a, b)
    }
    // 3-D: bit j of dim i sits at position 3j + i
    val z3 = org.apache.spark.sql.graft.ZValue.interleaveN(Array(1L, 1L, 1L))
    z3 shouldBe 7L // bits 0,1,2
    org.apache.spark.sql.graft.ZValue.interleaveN(Array(2L, 0L, 0L)) shouldBe 8L
    org.apache.spark.sql.graft.ZValue.interleaveN(Array(0L, 2L, 0L)) shouldBe 16L
    org.apache.spark.sql.graft.ZValue.interleaveN(Array(0L, 0L, 2L)) shouldBe 32L
    // expression evaluates via codegen inside a projection
    val df = spark.range(100).select(
      org.apache.spark.sql.graft.ZValue.zvalueN(Seq(
        col("id"), col("id") * 2, col("id") * 3)).as("z"), col("id"))
    df.collect().foreach { r =>
      r.getLong(0) shouldBe org.apache.spark.sql.graft.ZValue.interleaveN(
        Array(r.getLong(1), r.getLong(1) * 2, r.getLong(1) * 3))
    }
  }

  test("3-D z-order enables pruning on the third dimension") {
    withExtendedSession { s =>
      import s.implicits._
      // three interleaved dimensions, none correlated with the key
      val df = (0L until 4096L).map { i =>
        (i, (i * 7) % 64, (i * 13) % 64, (i * 29) % 64)
      }.toDF("k", "a", "b", "c")
      val t = Lake.create(s, Lake.freshRoot(), df, "k", 8)
      t.compactZOrderN(8, Seq("a", "b", "c"))
      val m = t.manifest(t.latestVersion)
      // every file carries bounds for all three dimensions
      m.files.foreach { f =>
        f.cols.keySet should contain allOf ("a", "b", "c")
      }
      // a 3-D box predicate scans fewer files than the table holds
      val scanned = t.read()
        .filter(col("a") < 16 && col("b") < 16 && col("c") < 16)
        .select(input_file_name()).distinct().count()
      scanned should be < 8L
      // and the answer matches the raw relation
      t.read().filter(col("a") < 16 && col("b") < 16 && col("c") < 16)
        .count() shouldBe
        df.filter(col("a") < 16 && col("b") < 16 && col("c") < 16).count()
    }
  }
  test("graft_lake_history / graft_lake_files: metadata introspection from SQL") {
    withExtendedSession { s =>
      val t = mkTable(s)
      s.sql(s"DELETE FROM graft_lake('${t.root}') WHERE k <= 30").collect()
      // history: one row per retained commit, newest first, metadata-only
      val hist = s.sql(
        s"SELECT version, operation FROM graft_lake_history('${t.root}')")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      hist shouldBe Seq((1, "delete"), (0, "create"))
      // files: the resolved manifest as rows; v0 holds 3 files, v1 kept
      // 2 + rewrote 1 range away entirely (keys 1-30 erased)
      s.sql(s"SELECT count(*) FROM graft_lake_files('${t.root}', 0)")
        .collect()(0).getLong(0) shouldBe 3L
      val v1 = s.sql(
        s"""SELECT kind, n_rows, min_key, max_key
           |FROM graft_lake_files('${t.root}') ORDER BY min_key""".stripMargin)
        .collect()
      v1.map(_.getString(0)).foreach(_ shouldBe "data")
      v1.map(_.getLong(1)).sum shouldBe 60L
      v1.head.getLong(2) shouldBe 31L
      // tombstone files are listed with their kind
      locally {
        import s.implicits._
        t.deleteDeferred((31L to 35L).toDF("k"))
      }
      val kinds = s.sql(
        s"SELECT kind, count(*) AS n FROM graft_lake_files('${t.root}') GROUP BY 1")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      kinds("data") shouldBe 2L
      kinds("tombstone") shouldBe 1L
    }
  }
  test("INSERT INTO: append-only commit, PK conflict refusal, tombstone revive") {
    withExtendedSession { s =>
      import s.implicits._
      val t = mkTable(s) // keys 1..90, 3 files
      val v0Files = t.manifest(0).files.map(_.path).toSet
      Seq((200L, "NEW200", "I", 1.0), (15L, "MID15", "I", 2.0))
        .toDF("k", "payload", "status", "amount")
        .createOrReplaceTempView("ins_src")
      // key 15 EXISTS: the keyed table refuses the whole insert
      val e = intercept[IllegalArgumentException] {
        s.sql(s"INSERT INTO graft_lake('${t.root}') SELECT * FROM ins_src")
          .collect()
      }
      e.getMessage should include("duplicate existing keys")
      t.latestVersion shouldBe 0
      // conflict-free insert: adds files, removes NOTHING (append path) —
      // even though key 95 falls inside no file and 200 beyond all ranges
      Seq((95L, "NEW95", "I", 1.0), (200L, "NEW200", "I", 2.0))
        .toDF("k", "payload", "status", "amount")
        .createOrReplaceTempView("ins_src2")
      val stats = s.sql(
        s"INSERT INTO graft_lake('${t.root}') SELECT * FROM ins_src2")
        .collect()(0)
      stats.getInt(2) shouldBe 0 // rewritten_files: the append contract
      val m1 = t.manifest(1)
      v0Files.subsetOf(m1.files.map(_.path).toSet) shouldBe true
      t.read().count() shouldBe 92L
      rows(t.read().filter(col("k") >= 95L).select("k", "payload").orderBy("k")) shouldBe
        Seq(Seq(95L, "NEW95"), Seq(200L, "NEW200"))
      // a TOMBSTONED key conflicts like a live one: an append rewrites
      // nothing, so it cannot safely revive (the old physical row would
      // resurrect next to the new one) — MERGE does that
      t.deleteDeferred(Seq(7L).toDF("k"))
      Seq((7L, "BACK7", "I", 3.0)).toDF("k", "payload", "status", "amount")
        .createOrReplaceTempView("ins_src3")
      val e2 = intercept[IllegalArgumentException] {
        s.sql(s"INSERT INTO graft_lake('${t.root}') SELECT * FROM ins_src3")
          .collect()
      }
      e2.getMessage should include("tombstoned")
      t.read().count() shouldBe 91L // 92 minus the tombstoned key
      // MERGE through the tombstone revives cleanly
      s.sql(
        s"""MERGE INTO graft_lake('${t.root}') USING ins_src3 ON k = k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      rows(t.read().filter(col("k") === 7L).select("payload")) shouldBe
        Seq(Seq("BACK7"))
      t.read().count() shouldBe 92L
      // widening through INSERT refuses — that evolution belongs to MERGE
      Seq((300L, 1, "I")).toDF("k", "amount", "payload")
        .select(col("k"), col("payload"), col("payload").as("status"),
          col("amount"))
        .createOrReplaceTempView("ins_bad")
      intercept[Exception] {
        s.sql(
          s"""INSERT INTO graft_lake('${t.root}')
             |SELECT k, payload, status, CAST(amount AS STRING) AS amount
             |FROM ins_bad""".stripMargin).collect()
      }
    }
  }
  test("CREATE TABLE AS: full SQL lifecycle; typed empty reads") {
    withExtendedSession { s =>
      import s.implicits._
      (1L to 50L).map(k => (k, k % 5, s"v$k")).toDF("k", "p", "payload")
        .createOrReplaceTempView("ctas_src")
      val root = graft.sources.Lake.freshRoot() + "/t"
      val stats = s.sql(
        s"""CREATE TABLE graft_lake('$root') KEY k FILES 4
           |PARTITIONED BY (p) STATS (payload)
           |AS SELECT * FROM ctas_src""".stripMargin).collect()(0)
      stats.getInt(3) should be >= 4 // added files (per partition slices)
      stats.getLong(4) shouldBe 50L
      val t = new graft.sources.LakeTable(s, root)
      t.manifest(0).partitionCols shouldBe Seq("p")
      t.manifest(0).statsCols shouldBe Seq("payload")
      t.read().count() shouldBe 50L
      // a second CREATE at the same root refuses
      intercept[IllegalArgumentException] {
        s.sql(s"CREATE TABLE graft_lake('$root') KEY k AS SELECT * FROM ctas_src")
          .collect()
      }.getMessage should include("already exists")
      // full-wipe DELETE leaves a TYPED empty relation (the recorded
      // schema survives an empty snapshot)
      s.sql(s"DELETE FROM graft_lake('$root')").collect()
      val empty = t.read()
      empty.count() shouldBe 0L
      empty.schema.fieldNames.toSeq shouldBe Seq("k", "payload", "p")
      // and SQL over the empty snapshot still works
      s.sql(s"SELECT count(*) AS n FROM graft_lake_at('$root')")
        .collect()(0).getLong(0) shouldBe 0L
      // CREATE TABLE on a NON-lake target delegates to the default
      // parser and runs as ordinary Spark DDL
      s.sql("CREATE TABLE plain_ctas_probe (x INT) USING parquet")
      s.catalog.tableExists("plain_ctas_probe") shouldBe true
      s.sql("DROP TABLE plain_ctas_probe")
    }
  }
  test("statements scan through SQL comments and semicolons") {
    withExtendedSession { s =>
      val t = mkTable(s)
      s.sql(
        s"""-- erase the cheap rows
           |DELETE FROM /* the lake */ graft_lake('${t.root}')
           |WHERE amount < 100.0; -- trailing note""".stripMargin).collect()
      t.read().count() shouldBe 81L // keys 1..9 erased (amount = k*10)
      // a comment containing a clause keyword must not truncate the scan
      import s.implicits._
      Seq((10L, "X", "U", 0.0)).toDF("k", "payload", "status", "amount")
        .createOrReplaceTempView("cm_src")
      s.sql(
        s"""MERGE INTO graft_lake('${t.root}') t
           |USING cm_src s ON t.k = s.k -- when matched, replace
           |WHEN MATCHED THEN UPDATE SET * /* when not matched: insert */
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      rows(t.read().filter(col("k") === 10L).select("payload")) shouldBe
        Seq(Seq("X"))
    }
  }

  test("ALTER TABLE PARTITIONED BY: SQL partition-spec evolution") {
    withExtendedSession { s =>
      import s.implicits._
      val t = {
        val df = (1L to 90L).map(k => (k, k % 3, k % 5))
          .toDF("k", "a", "b")
        Lake.create(s, Lake.freshRoot(), df, "k", 2, partitionBy = Seq("a"))
      }
      val before = t.manifest(0).files.map(_.path)
      s.sql(s"ALTER TABLE graft_lake('${t.root}') PARTITIONED BY (b)")
        .collect()
      val m = t.manifest(t.latestVersion)
      m.partitionCols shouldBe Seq("b")
      m.files.map(_.path) shouldBe before // metadata-only
      s.sql(s"""INSERT INTO graft_lake('${t.root}')
               |SELECT id + 100 AS k, id % 3 AS a, id % 5 AS b
               |FROM range(1, 11)""".stripMargin).collect()
      t.read().count() shouldBe 100L
      // inserted rows carry a = id % 3 (ids 1..10), not k % 3
      t.read().filter(col("a") === 1L).count() shouldBe
        ((1L to 90L).count(_ % 3 == 1) + (1L to 10L).count(_ % 3 == 1))
      // un-partition via SQL with an empty column list
      s.sql(s"ALTER TABLE graft_lake('${t.root}') PARTITIONED BY ()")
        .collect()
      t.manifest(t.latestVersion).partitionCols shouldBe empty
    }
  }

  test("APPEND LOG tables: full SQL lifecycle; MERGE refuses with guidance") {
    withExtendedSession { s =>
      import s.implicits._
      val root = Lake.freshRoot()
      (1L to 40L).map(i => (i, s"e$i", i % 5)).toDF("id", "msg", "shard")
        .createOrReplaceTempView("applog_src")
      // keyless CTAS
      s.sql(s"""CREATE TABLE graft_lake('$root') APPEND LOG FILES 2
               |STATS (shard) AS SELECT * FROM applog_src""".stripMargin)
        .collect()
      val t = new graft.sources.LakeTable(s, root)
      t.manifest(0).keyCol shouldBe ""
      // INSERT INTO appends blind — re-inserting existing rows is fine
      s.sql(s"""INSERT INTO graft_lake('$root')
               |SELECT * FROM applog_src WHERE id <= 5""".stripMargin).collect()
      t.read().count() shouldBe 45L
      // predicate DML
      s.sql(s"DELETE FROM graft_lake('$root') WHERE shard = 4").collect()
      t.read().filter(col("shard") === 4L).count() shouldBe 0L
      s.sql(s"""UPDATE graft_lake('$root') SET msg = 'U'
               |WHERE shard = 0""".stripMargin).collect()
      t.read().filter(col("msg") === "U").count() shouldBe
        t.read().filter(col("shard") === 0L).count()
      // maintenance verbs
      s.sql(s"OPTIMIZE graft_lake('$root') BINPACK 1000").collect()
      s.sql(s"VACUUM graft_lake('$root') RETAIN 10 VERSIONS").collect()
      // keyed-only SQL refuses with the append-log message
      val e = intercept[Exception] {
        s.sql(s"""MERGE INTO graft_lake('$root') AS t
                 |USING applog_src AS s ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET *""".stripMargin).collect()
      }
      e.getMessage should include("append-log")
      val e2 = intercept[Exception] {
        s.sql(s"DELETE DEFERRED FROM graft_lake('$root') WHERE shard = 1")
          .collect()
      }
      e2.getMessage should include("append-log")
    }
  }

  test("named tables: full lifecycle by name, no path spelled once") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 90L).map(k => (k, s"val$k", k * 10.0))
        .toDF("k", "payload", "amount")
        .createOrReplaceTempView("cat_src")
      // CREATE by name — managed root under the catalog dir
      s.sql("CREATE TABLE t_orders KEY k FILES 3 AS SELECT * FROM cat_src")
        .collect()
      // read by name (analyzer rule), incl. inside a join of itself
      s.sql("SELECT count(*) AS n FROM t_orders").collect()(0)
        .getLong(0) shouldBe 90L
      // INSERT by name
      s.sql("INSERT INTO t_orders SELECT k + 1000 AS k, payload, amount " +
        "FROM cat_src WHERE k <= 5").collect()
      // MERGE by name
      Seq((7L, "PATCHED", 0.0)).toDF("k", "payload", "amount")
        .createOrReplaceTempView("cat_upd")
      s.sql(
        """MERGE INTO t_orders AS tgt USING cat_upd AS src
          |ON tgt.k = src.k
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin).collect()
      // UPDATE / DELETE by name
      s.sql("UPDATE t_orders SET payload = 'U' WHERE k = 8").collect()
      s.sql("DELETE FROM t_orders WHERE k = 9").collect()
      // maintenance + RESTORE-shaped verbs by name
      s.sql("OPTIMIZE t_orders BINPACK 1000").collect()
      s.sql("ANALYZE TABLE t_orders COMPUTE STATISTICS FOR COLUMNS amount")
        .collect()
      val cur = s.sql("SELECT payload FROM t_orders WHERE k IN (7, 8)")
        .collect().map(_.getString(0)).sorted
      cur shouldBe Array("PATCHED", "U")
      s.sql("SELECT count(*) AS n FROM t_orders").collect()(0)
        .getLong(0) shouldBe 94L // +5 inserts, -1 delete
      // time travel by NAME through Spark's native AS OF grammar
      s.sql("SELECT count(*) FROM t_orders VERSION AS OF 0").collect()(0)
        .getLong(0) shouldBe 90L
      s.sql("SELECT payload FROM t_orders VERSION AS OF 0 WHERE k = 7")
        .collect()(0).getString(0) shouldBe "val7"
      // catalog listing
      s.sql("SELECT name FROM graft_catalog()").collect()
        .map(_.getString(0)).toSeq shouldBe Seq("t_orders")
      // clone by name, then read the clone by name
      s.sql("CREATE TABLE t_orders2 SHALLOW CLONE t_orders VERSION AS OF 0")
        .collect()
      s.sql("SELECT count(*) FROM t_orders2").collect()(0)
        .getLong(0) shouldBe 90L
      // DROP unbinds the NAME only; the data stays and can re-bind
      val dropped = s.sql("DROP TABLE t_orders").collect()(0)
      val root = dropped.getString(1)
      intercept[Exception] {
        s.sql("SELECT count(*) FROM t_orders").collect()
      }
      s.sql(s"SELECT count(*) FROM graft_lake('$root')").collect()(0)
        .getLong(0) shouldBe 94L
      s.sql(s"CREATE TABLE t_orders USING graft_lake LOCATION '$root'")
        .collect()
      s.sql("SELECT count(*) FROM t_orders").collect()(0)
        .getLong(0) shouldBe 94L
      // the table FUNCTIONS take the name too (root args resolve through
      // the catalog; spelled paths keep working verbatim)
      s.sql("SELECT count(*) FROM graft_lake_history('t_orders')")
        .collect()(0).getLong(0) should be >= 1L
      s.sql("SELECT count(*) FROM graft_lake_at('t_orders', 0)")
        .collect()(0).getLong(0) shouldBe 90L
      // DROP → re-CREATE of a MANAGED name must work: managed roots are
      // unique per registration, so the fresh table never collides with
      // the dropped one's data (which stays at its own root)
      s.sql("DROP TABLE t_orders").collect()
      s.sql("CREATE TABLE t_orders KEY k FILES 2 " +
        "AS SELECT * FROM cat_src WHERE k <= 10").collect()
      s.sql("SELECT count(*) FROM t_orders").collect()(0)
        .getLong(0) shouldBe 10L
      s.sql(s"SELECT count(*) FROM graft_lake('$root')").collect()(0)
        .getLong(0) shouldBe 94L // the dropped table's data is untouched
      // malformed DROP (IF without EXISTS) delegates — the default parser
      // rejects it, and the binding survives
      intercept[Exception] { s.sql("DROP TABLE IF t_orders").collect() }
      s.sql("SELECT count(*) FROM t_orders").collect()(0)
        .getLong(0) shouldBe 10L
      // idempotent CREATE: IF NOT EXISTS on a bound name is a no-op
      s.sql("CREATE TABLE IF NOT EXISTS t_orders KEY k " +
        "AS SELECT * FROM cat_src").collect()
      s.sql("SELECT count(*) FROM t_orders").collect()(0)
        .getLong(0) shouldBe 10L // unchanged — nothing was created
      // rename the BINDING: the root never moves, the old name frees up
      s.sql("ALTER TABLE t_orders RENAME TO t_orders_v2").collect()
      s.sql("SELECT count(*) FROM t_orders_v2").collect()(0)
        .getLong(0) shouldBe 10L
      intercept[Exception] {
        s.sql("SELECT count(*) FROM t_orders").collect()
      }
    }
  }

  test("catalog: racing claims of one name get exactly one winner") {
    import graft.sources.LakeCatalog
    spark.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val attempts = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Option[String]] {
          override def call(): Option[String] =
            scala.util.Try {
              LakeCatalog.register(spark, "raced_name", s"/tmp/raced-$i")
              s"/tmp/raced-$i"
            }.toOption
        })
      }
      val winners = attempts.flatMap(_.get())
      winners.size shouldBe 1 // one atomic claim, seven clean refusals
      LakeCatalog.lookup(spark, "raced_name") shouldBe Some(winners.head)
    } finally pool.shutdown()
  }

  test("named tables: refusal and delegation surface") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 9L).map(k => (k, s"v$k")).toDF("k", "payload")
        .createOrReplaceTempView("cat_ref_src")
      s.sql("CREATE TABLE bound_t KEY k AS SELECT * FROM cat_ref_src")
        .collect()
      // CREATE of an already-bound name refuses with guidance
      val dup = intercept[Exception] {
        s.sql("CREATE TABLE bound_t KEY k AS SELECT * FROM cat_ref_src")
          .collect()
      }
      dup.getMessage should include("already bound")
      dup.getMessage should include("DROP TABLE bound_t")
      // binding a location with no lake table refuses with guidance
      val noTable = intercept[Exception] {
        s.sql(s"CREATE TABLE ghost USING graft_lake LOCATION " +
          s"'${Lake.freshRoot()}/empty'").collect()
      }
      noTable.getMessage should include("no lake table at")
      // ...and the failed bind did NOT leak a catalog entry
      s.sql("SELECT count(*) FROM graft_catalog()").collect()(0)
        .getLong(0) shouldBe 1L
      // lake DML on an UNREGISTERED name delegates to Spark — the error
      // is Spark's own resolution failure, never a graft refusal
      val unk = intercept[Exception] {
        s.sql("DELETE FROM not_a_lake_table WHERE k = 1").collect()
      }
      unk.getMessage.toLowerCase should not include "graft"
      val unkRead = intercept[Exception] {
        s.sql("SELECT * FROM never_registered").collect()
      }
      unkRead.getMessage.toLowerCase should not include "graft"
      // DROP TABLE of an unregistered name delegates (Spark's own error)
      val unkDrop = intercept[Exception] {
        s.sql("DROP TABLE never_registered").collect()
      }
      unkDrop.getMessage.toLowerCase should not include "graft"
      // an UNBOUND two-part name delegates (bound_t lives at the bare
      // name; the db.* spelling is a different, unbound binding key)
      val multi = intercept[Exception] {
        s.sql("DELETE FROM db.bound_t WHERE k = 1").collect()
      }
      multi.getMessage.toLowerCase should not include "graft"
      // a TEMP VIEW sharing the name shadows the catalog binding on READS
      // (Spark's own resolution runs first) — writes still hit the lake
      (101L to 103L).map(k => (k, "view")).toDF("k", "payload")
        .createOrReplaceTempView("bound_t")
      s.sql("SELECT count(*) FROM bound_t").collect()(0)
        .getLong(0) shouldBe 3L
      s.catalog.dropTempView("bound_t")
      s.sql("SELECT count(*) FROM bound_t").collect()(0)
        .getLong(0) shouldBe 9L
      // Spark-grammar INSERT forms against a lake table name refuse with
      // graft guidance (the parser serves only INSERT INTO <name> <q>;
      // OVERWRITE would otherwise die in a baffling generic not-found) —
      // and the refusal leaves the table untouched
      intercept[Exception] {
        s.sql("INSERT OVERWRITE bound_t SELECT 1L AS k, 'x' AS payload")
          .collect()
      }.getMessage should include("INSERT form is not supported")
      s.sql("SELECT count(*) FROM bound_t").collect()(0).getLong(0) shouldBe 9L
      // ordinary CREATE TABLE still delegates untouched
      s.sql("CREATE TABLE plain_spark_t (id INT) USING parquet")
      s.sql("INSERT INTO plain_spark_t VALUES (1), (2)").collect()
      s.sql("SELECT count(*) FROM plain_spark_t").collect()(0)
        .getLong(0) shouldBe 2L
      s.sql("DROP TABLE plain_spark_t")
    }
  }

  test("persisted views: lifecycle, nesting, late binding, listing") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 40L).map(k => (k, if (k <= 30) "A" else "B", k * 2))
        .toDF("k", "grp", "amount").createOrReplaceTempView("vw_src")
      s.sql("CREATE TABLE vw_base KEY k FILES 2 AS SELECT * FROM vw_src")
        .collect()
      // view over the named table
      s.sql("CREATE VIEW v_a AS SELECT k, amount FROM vw_base " +
        "WHERE grp = 'A'").collect()
      s.sql("SELECT count(*) FROM v_a").collect()(0).getLong(0) shouldBe 30L
      // view over the VIEW (nesting through the same resolution)
      s.sql("CREATE VIEW v_a_sum AS SELECT sum(amount) AS total FROM v_a")
        .collect()
      s.sql("SELECT total FROM v_a_sum").collect()(0)
        .getLong(0) shouldBe (1L to 30L).map(_ * 2).sum
      // LATE BINDING on the base table: new rows show through both views
      s.sql("INSERT INTO vw_base SELECT k + 100 AS k, 'A' AS grp, " +
        "0L AS amount FROM vw_src WHERE k <= 4").collect()
      s.sql("SELECT count(*) FROM v_a").collect()(0).getLong(0) shouldBe 34L
      // LATE BINDING on the nested view: OR REPLACE of the inner view
      // changes what the outer view serves, with no outer-view touch
      s.sql("CREATE OR REPLACE VIEW v_a AS SELECT k, amount FROM vw_base " +
        "WHERE grp = 'B'").collect()
      s.sql("SELECT total FROM v_a_sum").collect()(0)
        .getLong(0) shouldBe (31L to 40L).map(_ * 2).sum
      // IF NOT EXISTS on a bound view is a no-op that returns the binding
      s.sql("CREATE VIEW IF NOT EXISTS v_a AS SELECT 1 AS one").collect()
      s.sql("SELECT count(*) FROM v_a").collect()(0).getLong(0) shouldBe 10L
      // the listing carries both kinds; a view's target is its query text
      val byKind = s.sql("SELECT name, kind, target FROM graft_catalog()")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      byKind shouldBe Map("vw_base" -> "table", "v_a" -> "view",
        "v_a_sum" -> "view")
      s.sql("SELECT target FROM graft_catalog() WHERE name = 'v_a'")
        .collect()(0).getString(0) should include("grp = 'B'")
      // views work through spark.read.table too (same analyzer rule)
      s.read.table("v_a_sum").collect()(0)
        .getLong(0) shouldBe (31L to 40L).map(_ * 2).sum
      // QUALIFIED references resolve — the splice wraps in
      // SubqueryAlias(name), for tables, views, and their joins
      s.sql("SELECT vw_base.k FROM vw_base WHERE vw_base.k = 3")
        .collect()(0).getLong(0) shouldBe 3L
      s.sql("SELECT v_a.k FROM v_a WHERE v_a.k = 35").collect()(0)
        .getLong(0) shouldBe 35L
      s.sql(
        """SELECT count(*) FROM v_a JOIN vw_base
          |ON v_a.k = vw_base.k WHERE vw_base.grp = 'B'""".stripMargin)
        .collect()(0).getLong(0) shouldBe 10L
      s.sql("SELECT vw_base.k FROM vw_base VERSION AS OF 0 " +
        "WHERE vw_base.k = 7").collect()(0).getLong(0) shouldBe 7L
      // DROP VIEW unbinds; the base table is untouched
      s.sql("DROP VIEW v_a_sum").collect()
      intercept[Exception] { s.sql("SELECT * FROM v_a_sum").collect() }
      s.sql("SELECT count(*) FROM vw_base").collect()(0)
        .getLong(0) shouldBe 44L
    }
  }

  test("persisted views: refusals, cycles, and delegation") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 9L).map(k => (k, s"v$k")).toDF("k", "payload")
        .createOrReplaceTempView("vwr_src")
      s.sql("CREATE TABLE vwr_t KEY k AS SELECT * FROM vwr_src").collect()
      s.sql("CREATE VIEW vwr_v AS SELECT k FROM vwr_t WHERE k <= 3")
        .collect()
      // CREATE VIEW on a TABLE-bound name refuses (and OR REPLACE never
      // replaces a table binding)
      intercept[Exception] {
        s.sql("CREATE VIEW vwr_t AS SELECT 1 AS one").collect()
      }.getMessage should include("bound to a TABLE")
      intercept[Exception] {
        s.sql("CREATE OR REPLACE VIEW vwr_t AS SELECT 1 AS one").collect()
      }.getMessage should include("bound to a TABLE")
      // CREATE TABLE on a VIEW-bound name refuses
      intercept[Exception] {
        s.sql("CREATE TABLE vwr_v KEY k AS SELECT * FROM vwr_src").collect()
      }.getMessage should include("VIEW")
      // plain CREATE VIEW on a bound view refuses with OR REPLACE guidance
      intercept[Exception] {
        s.sql("CREATE VIEW vwr_v AS SELECT 1 AS one").collect()
      }.getMessage should include("CREATE OR REPLACE VIEW")
      // a command body refuses: a view must never execute side effects
      intercept[Exception] {
        s.sql("CREATE VIEW vwr_cmd AS DROP TABLE vwr_t").collect()
      }
      s.sql("SELECT count(*) FROM vwr_t").collect()(0).getLong(0) shouldBe 9L
      // ...including a command-SHAPED body that only ANALYZES to a write
      // command (INSERT INTO parses as a plain statement): it must refuse
      // WITHOUT executing — the validation itself must not insert
      s.sql("CREATE TABLE vwr_probe (id INT) USING parquet")
      intercept[Exception] {
        s.sql("CREATE VIEW vwr_ins AS INSERT INTO vwr_probe VALUES (1)")
          .collect()
      }.getMessage should include("not a command")
      s.sql("SELECT count(*) FROM vwr_probe").collect()(0)
        .getLong(0) shouldBe 0L // zero side effects, even from validation
      s.sql("DROP TABLE vwr_probe")
      // an unresolvable body refuses at CREATE, not at first read
      intercept[Exception] {
        s.sql("CREATE VIEW vwr_ghost AS SELECT * FROM no_such_base")
          .collect()
      }
      // views are READ-ONLY: every write/storage verb refuses loudly.
      // INSERT INTO is caught at PARSE (the lake verb's name resolution);
      // INSERT OVERWRITE delegates to Spark's grammar and is caught by
      // the analyzer guard instead — both loud, each naming the view
      intercept[Exception] {
        s.sql("INSERT INTO vwr_v SELECT 99 AS k").collect()
      }.getMessage should include("views have no storage")
      intercept[Exception] {
        s.sql("INSERT OVERWRITE vwr_v SELECT 99 AS k").collect()
      }.getMessage should include("read-only")
      intercept[Exception] {
        s.sql("UPDATE vwr_v SET k = 0 WHERE k = 1").collect()
      }.getMessage should include("VIEW")
      intercept[Exception] {
        s.sql("DELETE FROM vwr_v WHERE k = 1").collect()
      }.getMessage should include("VIEW")
      intercept[Exception] {
        s.sql("OPTIMIZE vwr_v BINPACK 10").collect()
      }.getMessage should include("VIEW")
      intercept[Exception] {
        s.sql("DROP TABLE vwr_v").collect()
      }.getMessage should include("use DROP VIEW")
      intercept[Exception] {
        s.sql("DROP VIEW vwr_t").collect()
      }.getMessage should include("use DROP TABLE")
      // ...but IF EXISTS tolerates the cross-kind miss: idempotent
      // cleanup no-ops, and both bindings survive untouched
      s.sql("DROP TABLE IF EXISTS vwr_v")
      s.sql("DROP VIEW IF EXISTS vwr_t")
      s.sql("DROP MATERIALIZED VIEW IF EXISTS vwr_t").collect()
      s.sql("SELECT count(*) FROM vwr_v").collect()(0).getLong(0) shouldBe 3L
      s.sql("SELECT count(*) FROM vwr_t").collect()(0).getLong(0) shouldBe 9L
      // time travel pins tables, not views
      intercept[Exception] {
        s.sql("SELECT * FROM vwr_v VERSION AS OF 0").collect()
      }.getMessage should include("time travel")
      // a view name is not a path: format surfaces and table functions
      // refuse instead of file-not-found
      intercept[Exception] {
        s.sql("SELECT * FROM graft_lake_history('vwr_v')").collect()
      }.getMessage should include("no root path")
      // REPLACE-created cycle: v1 → v2, then v2 REPLACED to read v1 —
      // each CREATE validated, the read hits the depth cap loudly
      s.sql("CREATE VIEW vwr_c1 AS SELECT k FROM vwr_t").collect()
      s.sql("CREATE VIEW vwr_c2 AS SELECT k FROM vwr_c1").collect()
      s.sql("CREATE OR REPLACE VIEW vwr_c1 AS SELECT k FROM vwr_c2")
        .collect()
      intercept[Exception] {
        s.sql("SELECT count(*) FROM vwr_c1").collect()
      }.getMessage should include("nesting depth")
      // a dropped base makes the view fail AT READ with a stale message
      s.sql("CREATE TABLE vwr_base2 KEY k AS SELECT * FROM vwr_src")
        .collect()
      s.sql("CREATE VIEW vwr_late AS SELECT k FROM vwr_base2").collect()
      s.sql("DROP TABLE vwr_base2").collect()
      intercept[Exception] {
        s.sql("SELECT * FROM vwr_late").collect()
      }.getMessage should include("stale")
      // TEMP VIEW DDL delegates untouched
      s.sql("CREATE TEMPORARY VIEW vwr_tmp AS SELECT 1 AS one")
      s.sql("SELECT one FROM vwr_tmp").collect()(0).getInt(0) shouldBe 1
      s.sql("DROP VIEW vwr_tmp") // Spark's own temp view, Spark's own DROP
      // a TWO-part name is a graft NAMESPACE binding (round 17); THREE
      // or more parts are never ours and delegate untouched
      s.sql("CREATE VIEW db.vwr_m AS SELECT 1 AS one").collect()
      s.sql("SELECT one FROM db.vwr_m").collect()(0).getInt(0) shouldBe 1
      s.sql("DROP VIEW db.vwr_m").collect()
      val multi = intercept[Exception] {
        s.sql("CREATE VIEW cat.db.vwr_m AS SELECT 1 AS one").collect()
      }
      multi.getMessage.toLowerCase should not include "graft"
      // a TEMP VIEW sharing a graft view's name shadows it on reads
      Seq((1L, 2L)).toDF("a", "b").createOrReplaceTempView("vwr_v")
      s.sql("SELECT b FROM vwr_v").collect()(0).getLong(0) shouldBe 2L
      s.catalog.dropTempView("vwr_v")
      s.sql("SELECT count(*) FROM vwr_v").collect()(0).getLong(0) shouldBe 3L
    }
  }

  test("materialized views: incremental refresh ≡ from-scratch, staleness, liveness") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 100L).map(k => (k, if (k <= 60) "A" else if (k <= 90) "B" else "C",
          if (k % 10 == 0) null else java.lang.Double.valueOf(k.toDouble)))
        .toDF("k", "grp", "v").createOrReplaceTempView("mvt_src")
      s.sql("CREATE TABLE mvt_base KEY k FILES 4 AS SELECT * FROM mvt_src")
        .collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvt AS
          |SELECT grp, count(*) AS n, count(v) AS nv, sum(v) AS sv,
          |       avg(v) AS av
          |FROM mvt_base WHERE k <= 95 GROUP BY grp""".stripMargin).collect()
      // avg reconstructs from the SAME stored dividend/divisor the fold
      // maintains, so the from-scratch twin must divide identically:
      // DECIMAL(28,10) sum over BIGINT non-null count, then to double
      def fromScratch() = s.sql(
        """SELECT grp, count(*) AS n, count(v) AS nv,
          |       CAST(sum(CAST(v AS DECIMAL(28,10))) AS DECIMAL(28,10)) AS sv,
          |       CAST(CAST(sum(CAST(v AS DECIMAL(28,10))) AS DECIMAL(28,10))
          |            AS DOUBLE) / count(v) AS av
          |FROM mvt_base WHERE k <= 95 GROUP BY grp ORDER BY grp""".stripMargin)
        .collect().toSeq
      def mvRows() = s.sql(
        "SELECT grp, n, nv, CAST(sv AS DECIMAL(28,10)) AS sv, " +
          "CAST(av AS DOUBLE) AS av FROM mvt ORDER BY grp")
        .collect().toSeq
      mvRows() shouldBe fromScratch()
      // STALENESS is the contract: mutations invisible until REFRESH
      val before = mvRows()
      s.sql("UPDATE mvt_base SET grp = 'B' WHERE k >= 50 AND k <= 55")
        .collect()
      mvRows() shouldBe before // still the pre-mutation state
      mvRows() should not be fromScratch() // and the base really moved
      // refresh folds exactly the interval; a second refresh no-ops
      val r1 = s.sql("REFRESH MATERIALIZED VIEW mvt").collect()(0)
      r1.getInt(1) should be < r1.getInt(2) // advanced a real span
      mvRows() shouldBe fromScratch()
      val r2 = s.sql("REFRESH MATERIALIZED VIEW mvt").collect()(0)
      r2.getInt(1) shouldBe r2.getInt(2) // already fresh: no-op span
      r2.getLong(3) shouldBe 0L
      // group MOVE + group DEATH: C (k in 91..95 after the filter) dies
      s.sql("UPDATE mvt_base SET grp = 'B' WHERE grp = 'C' AND k <= 95")
        .collect()
      // sum-arg transitions: delete some of A's non-null values
      s.sql("DELETE FROM mvt_base WHERE k <= 9").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvt").collect()
      mvRows() shouldBe fromScratch()
      mvRows().map(_.getString(0)) should not contain "C" // dead group row DELETED
      // all-null sum group reads NULL (SQL sum semantics), not 0 —
      // keys 1..2 freed by the DELETE above, so the re-key is clean
      s.sql("INSERT INTO mvt_base SELECT k AS k, 'D' AS grp, " +
        "CAST(NULL AS DOUBLE) AS v FROM mvt_src WHERE k <= 2").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvt").collect()
      mvRows() shouldBe fromScratch()
      val dRow = mvRows().find(_.getString(0) == "D").get
      dRow.getLong(1) shouldBe 2L
      dRow.getLong(2) shouldBe 0L
      dRow.isNullAt(3) shouldBe true
      dRow.isNullAt(4) shouldBe true // all-null avg is NULL too
      // catalog listing carries the MV with its original statement
      s.sql("SELECT kind, target FROM graft_catalog() WHERE name = 'mvt'")
        .collect()(0).toSeq match {
        case Seq(kind: String, target: String) =>
          kind shouldBe "materialized_view"
          target should include("CREATE MATERIALIZED VIEW mvt")
        case other => fail(s"unexpected row: $other")
      }
      // net-zero group inside one interval is never materialized
      s.sql("INSERT INTO mvt_base SELECT k + 300 AS k, 'E' AS grp, " +
        "1.0D AS v FROM mvt_src WHERE k <= 2").collect()
      s.sql("DELETE FROM mvt_base WHERE grp = 'E'").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvt").collect()
      mvRows().map(_.getString(0)) should not contain "E"
      mvRows() shouldBe fromScratch()
      // staleness introspection: fresh now; one base commit → behind by 1
      def detail() = s.sql(
        "SELECT folded_to_version, base_latest_version, behind_by, " +
          "n_groups FROM graft_mv_detail('mvt')").collect()(0)
      detail().getInt(2) shouldBe 0
      detail().getLong(3) shouldBe mvRows().size.toLong
      s.sql("DELETE FROM mvt_base WHERE k = 96").collect() // outside filter
      detail().getInt(2) shouldBe 1
      s.sql("REFRESH MATERIALIZED VIEW mvt").collect()
      detail().getInt(2) shouldBe 0
      mvRows() shouldBe fromScratch() // filtered-out commit: same content
      intercept[Exception] {
        s.sql("SELECT * FROM graft_mv_detail('mvt_base')").collect()
      }.getMessage should include("no materialized view")
    }
  }

  test("materialized views: a KEYLESS (append-log) base folds through its content-diff feed") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 30L).map(k => (k, s"src${k % 4}", k * 2.0))
        .toDF("id", "source", "v").createOrReplaceTempView("mvk_src")
      s.sql("CREATE TABLE mvk_log APPEND LOG AS SELECT * FROM mvk_src")
        .collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvk AS
          |SELECT source, count(*) AS n, sum(v) AS sv
          |FROM mvk_log GROUP BY source""".stripMargin).collect()
      // appends are the keyless workload; the keyless feed is a CONTENT
      // multiset diff (insert/delete only — no update images), and the
      // fold must track it exactly, duplicates included
      s.sql("INSERT INTO mvk_log SELECT * FROM mvk_src WHERE id <= 5")
        .collect() // duplicate rows — a multiset, not a set
      s.sql("INSERT INTO mvk_log SELECT id + 100 AS id, 'src9' AS source, " +
        "CAST(1.0 AS DOUBLE) AS v FROM mvk_src WHERE id <= 3").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvk").collect()
      val mv = s.sql(
        "SELECT source, n, CAST(sv AS DECIMAL(28,10)) AS sv FROM mvk " +
          "ORDER BY source").collect().toSeq
      val scratch = s.sql(
        """SELECT source, count(*) AS n,
          |CAST(sum(CAST(v AS DECIMAL(28,10))) AS DECIMAL(28,10)) AS sv
          |FROM mvk_log GROUP BY source ORDER BY source""".stripMargin)
        .collect().toSeq
      mv shouldBe scratch
      mv.map(_.getString(0)) should contain("src9") // new group inserted
    }
  }

  test("materialized views over a STRING-keyed base: the features compose") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 60L).map(k => (f"doc-$k%04d", s"g${k % 3}", k.toDouble))
        .toDF("doc_id", "grp", "v").createOrReplaceTempView("mvsk_src")
      // string-keyed base through SQL CTAS (parser + embedding create)
      s.sql("CREATE TABLE mvsk_base KEY doc_id FILES 3 " +
        "AS SELECT * FROM mvsk_src").collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvsk AS
          |SELECT grp, count(*) AS n, sum(v) AS sv, avg(v) AS av
          |FROM mvsk_base GROUP BY grp""".stripMargin).collect()
      // mutate through the string key: the feed pairs pre/post images on
      // it, and the fold must track a group move + a delete exactly
      s.sql("UPDATE mvsk_base SET grp = 'g9' WHERE doc_id <= 'doc-0010'")
        .collect()
      s.sql("DELETE FROM mvsk_base WHERE doc_id LIKE '%5'").collect()
      s.sql("INSERT INTO mvsk_base SELECT 'xtr-' || doc_id AS doc_id, " +
        "grp, v FROM mvsk_src WHERE doc_id <= 'doc-0004'").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvsk").collect()
      val mv = s.sql(
        """SELECT grp, n, CAST(sv AS DECIMAL(28,10)) AS sv,
          |CAST(av AS DOUBLE) AS av FROM mvsk ORDER BY grp""".stripMargin)
        .collect().toSeq
      val scratch = s.sql(
        """SELECT grp, count(*) AS n,
          |CAST(sum(CAST(v AS DECIMAL(28,10))) AS DECIMAL(28,10)) AS sv,
          |CAST(CAST(sum(CAST(v AS DECIMAL(28,10))) AS DECIMAL(28,10))
          |     AS DOUBLE) / count(v) AS av
          |FROM mvsk_base GROUP BY grp ORDER BY grp""".stripMargin)
        .collect().toSeq
      mv shouldBe scratch
      mv.map(_.getString(0)) should contain("g9")
    }
  }

  test("catalog SQL surface: SHOW TABLES, DESCRIBE, view/MV RENAME") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 30L).map(k => (k, s"g${k % 3}", k * 2.0))
        .toDF("k", "grp", "v").createOrReplaceTempView("cats_src")
      s.sql("CREATE TABLE cats_t KEY k AS SELECT * FROM cats_src").collect()
      s.sql("CREATE VIEW cats_v AS SELECT grp, v FROM cats_t WHERE k <= 10")
        .collect()
      s.sql("CREATE MATERIALIZED VIEW cats_m AS SELECT grp, count(*) AS n, " +
        "sum(v) AS sv FROM cats_t GROUP BY grp").collect()
      // bare SHOW TABLES = the catalog listing, all three kinds
      val listing = s.sql("SHOW TABLES").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      listing should contain allOf (("cats_t", "table"),
        ("cats_v", "view"), ("cats_m", "materialized_view"))
      // longer SHOW forms stay Spark's
      s.sql("SHOW TABLES IN default").collect()
      // DESCRIBE dispatches on the bound kind; DESC and DESCRIBE TABLE
      // spell the same statement
      val dt = s.sql("DESCRIBE cats_t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      dt("kind") shouldBe "table"
      dt("key_col") shouldBe "k"
      dt("n_rows") shouldBe "30"
      dt("root") should not be empty
      val dv = s.sql("DESC cats_v").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      dv("kind") shouldBe "view"
      dv("query") should include("SELECT grp, v FROM cats_t")
      val dm = s.sql("DESCRIBE TABLE cats_m").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      dm("kind") shouldBe "materialized_view"
      dm("behind_by") shouldBe "0"
      dm("n_groups") shouldBe "3"
      dm("query") should include("CREATE MATERIALIZED VIEW cats_m")
      // unbound names delegate to Spark's own DESCRIBE (its error)
      intercept[Exception] {
        s.sql("DESCRIBE cats_nowhere").collect()
      }.getMessage.toLowerCase should not include "graft"
      // SHOW CREATE TABLE recreates per kind: view/MV statements
      // verbatim, tables as the LOCATION-adopting CREATE
      s.sql("SHOW CREATE TABLE cats_v").collect()(0).getString(1) shouldBe
        "CREATE VIEW cats_v AS SELECT grp, v FROM cats_t WHERE k <= 10"
      s.sql("SHOW CREATE TABLE cats_m").collect()(0)
        .getString(1) should startWith("CREATE MATERIALIZED VIEW cats_m")
      val ct = s.sql("SHOW CREATE TABLE cats_t").collect()(0).getString(1)
      ct should startWith("CREATE TABLE cats_t USING graft_lake LOCATION")
      ct should include(dt("root"))
      // DESCRIBE HISTORY: the commit log by name; views refuse loudly
      val hist = s.sql("DESCRIBE HISTORY cats_t").collect()
      hist.map(_.getInt(0)).toSeq shouldBe Seq(0) // one commit so far
      intercept[Exception] {
        s.sql("DESCRIBE HISTORY cats_v").collect()
      }.getMessage should include("VIEW")
      // VIEW RENAME: the binding moves; reads follow; the old name dies
      s.sql("ALTER VIEW cats_v RENAME TO cats_v2").collect()
      s.sql("SELECT count(*) FROM cats_v2").collect()(0)
        .getLong(0) shouldBe 10L
      intercept[Exception] { s.sql("SELECT count(*) FROM cats_v").collect() }
      // cross-kind renames refuse with the right verb
      intercept[Exception] {
        s.sql("ALTER VIEW cats_m RENAME TO x1").collect()
      }.getMessage should include("ALTER MATERIALIZED VIEW")
      intercept[Exception] {
        s.sql("ALTER MATERIALIZED VIEW cats_v2 RENAME TO x1").collect()
      }.getMessage should include("ALTER VIEW")
      intercept[Exception] {
        s.sql("ALTER VIEW cats_t RENAME TO x1").collect()
      }.getMessage should include("ALTER TABLE")
      // renaming onto any bound name refuses (one namespace)
      intercept[Exception] {
        s.sql("ALTER VIEW cats_v2 RENAME TO cats_t").collect()
      }.getMessage should include("already bound")
      // MV RENAME preserves the refresh bookkeeping: fold, rename, fold
      // again — the second fold must advance INCREMENTALLY from the
      // first's epoch tag (re-folding from init would double-count)
      s.sql("DELETE FROM cats_t WHERE k = 1").collect()
      s.sql("REFRESH MATERIALIZED VIEW cats_m").collect()
      s.sql("ALTER MATERIALIZED VIEW cats_m RENAME TO cats_m2").collect()
      s.sql("DELETE FROM cats_t WHERE k = 2").collect()
      val r = s.sql("REFRESH MATERIALIZED VIEW cats_m2").collect()(0)
      r.getInt(2) - r.getInt(1) shouldBe 1 // exactly the ONE new commit
      val mv = s.sql("SELECT grp, n, CAST(sv AS DECIMAL(28,10)) AS sv " +
        "FROM cats_m2 ORDER BY grp").collect().toSeq
      val scratch = s.sql(
        """SELECT grp, count(*) AS n,
          |CAST(sum(CAST(v AS DECIMAL(28,10))) AS DECIMAL(28,10)) AS sv
          |FROM cats_t GROUP BY grp ORDER BY grp""".stripMargin)
        .collect().toSeq
      mv shouldBe scratch
      intercept[Exception] { s.sql("SELECT * FROM cats_m").collect() }
      val dm2 = s.sql("DESCRIBE cats_m2").collect()
        .map(r2 => r2.getString(0) -> r2.getString(1)).toMap
      dm2("behind_by") shouldBe "0"
    }
  }

  test("materialized views: min/max group-scoped rescan, expression keys, HAVING") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      // v interior structure: per-group minima ≈ 1.x, maxima ≈ 39.x, a
      // null every 10th row — so the phases below can target "interior",
      // "ties the max", and "only nulls remain" deliberately
      (1L to 120L).map(k => (k, if (k % 10 == 0) null
          else java.lang.Double.valueOf((k % 40).toDouble + k / 100.0)))
        .toDF("k", "v").createOrReplaceTempView("mvmm_src")
      s.sql("CREATE TABLE mvmm_base KEY k FILES 4 AS SELECT * FROM mvmm_src")
        .collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvmm AS
          |SELECT k % 3 AS kb, count(*) AS n, min(v) AS lo, max(v) AS hi,
          |       max(k) AS hik, sum(v) AS sv
          |FROM mvmm_base WHERE k % 7 <> 0
          |GROUP BY k % 3 HAVING n >= 2""".stripMargin).collect()
      def fromScratch() = s.sql(
        """SELECT k % 3 AS kb, count(*) AS n, min(v) AS lo, max(v) AS hi,
          |       max(k) AS hik,
          |       CAST(sum(CAST(v AS DECIMAL(28,10))) AS DECIMAL(28,10)) AS sv
          |FROM mvmm_base WHERE k % 7 <> 0
          |GROUP BY k % 3 HAVING count(*) >= 2 ORDER BY kb""".stripMargin)
        .collect().toSeq
      def mvRows() = s.sql(
        "SELECT kb, n, lo, hi, hik, CAST(sv AS DECIMAL(28,10)) AS sv " +
          "FROM mvmm ORDER BY kb").collect().toSeq
      mvRows() shouldBe fromScratch()
      // 1) INSERT new maxima: the pure-fold path — NO rescan may fire
      s.sql("INSERT INTO mvmm_base SELECT k + 200 AS k, " +
        "CAST(50.0 + k AS DOUBLE) AS v FROM mvmm_src WHERE k <= 20")
        .collect()
      s.sql("REFRESH MATERIALIZED VIEW mvmm").collect()
      graft.sources.LakeMv.lastRescanGroups shouldBe 0L
      mvRows() shouldBe fromScratch()
      // 2) DELETE strictly-interior values: deletes fold, still NO rescan
      s.sql("DELETE FROM mvmm_base WHERE v >= 15.0 AND v < 20.0").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvmm").collect()
      graft.sources.LakeMv.lastRescanGroups shouldBe 0L
      mvRows() shouldBe fromScratch()
      // 3) DELETE every group's maximum: the rescan MUST fire, scoped to
      // exactly the affected groups, and land the true survivor extrema
      s.sql("DELETE FROM mvmm_base WHERE v >= 35.0").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvmm").collect()
      graft.sources.LakeMv.lastRescanGroups shouldBe 3L
      mvRows() shouldBe fromScratch()
      // 4) UPDATE that lowers the stored maxima in place (preimage ties
      // the extremum, postimage re-inserts lower — one interval)
      s.sql("UPDATE mvmm_base SET v = v - 3.0 WHERE v >= 30.0").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvmm").collect()
      graft.sources.LakeMv.lastRescanGroups should be > 0L
      mvRows() shouldBe fromScratch()
      // 5) a group whose non-null values ALL die reads NULL extrema over
      // a live count (SQL min/max semantics)
      s.sql("DELETE FROM mvmm_base WHERE k % 3 = 0 AND v IS NOT NULL")
        .collect()
      s.sql("REFRESH MATERIALIZED VIEW mvmm").collect()
      mvRows() shouldBe fromScratch()
      val g0 = mvRows().find(_.getLong(0) == 0L).get
      g0.getLong(1) should be > 0L
      g0.isNullAt(2) shouldBe true
      g0.isNullAt(3) shouldBe true
      g0.isNullAt(4) shouldBe false // max(k) keys never null
      // 6) repeated refresh after the rescan path is a clean no-op
      val r = s.sql("REFRESH MATERIALIZED VIEW mvmm").collect()(0)
      r.getInt(1) shouldBe r.getInt(2)
      mvRows() shouldBe fromScratch()

      // HAVING is a READ-time filter over retained state: a group can
      // cross the boundary in both directions across refreshes
      (1L to 6L).map(k => (k, k % 2)).toDF("k", "g2")
        .createOrReplaceTempView("mvh_src")
      s.sql("CREATE TABLE mvh_base KEY k AS SELECT * FROM mvh_src").collect()
      s.sql("CREATE MATERIALIZED VIEW mvh AS SELECT g2, count(*) AS n " +
        "FROM mvh_base GROUP BY g2 HAVING n >= 3").collect()
      def hRows() = s.sql("SELECT g2, n FROM mvh ORDER BY g2")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      hRows() shouldBe Seq((0L, 3L), (1L, 3L))
      s.sql("DELETE FROM mvh_base WHERE k = 2").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvh").collect()
      hRows() shouldBe Seq((1L, 3L)) // g2=0 below the bar: hidden, kept
      s.sql("INSERT INTO mvh_base SELECT k + 10 AS k, CAST(0 AS BIGINT) " +
        "AS g2 FROM mvh_src WHERE k <= 2").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvh").collect()
      hRows() shouldBe Seq((0L, 4L), (1L, 3L)) // re-entered

      // pre-round-16 catalog entries (no having line, g: items) parse
      val old = Seq("base=/x", "name=b", "init=0", "state=/y",
        "items=g:grp;a:count_star:n:", "where=-",
        "query=" + java.util.Base64.getEncoder.encodeToString(
          "q".getBytes("UTF-8"))).mkString("\n")
      val dd = graft.sources.LakeMv.parseDef(old)
      dd.havingSql shouldBe None
      dd.items.head shouldBe graft.sources.LakeMv.GroupItem("grp")
      dd.items.head.asInstanceOf[graft.sources.LakeMv.GroupItem]
        .isBare shouldBe true
    }
  }

  test("materialized views: count(DISTINCT) folds every value transition") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      // every group sees all 10 u-values, multiplicity 2 — so the phases
      // below can hit decrement-no-death, death, birth, and NULLs
      (1L to 60L).map(k => (k, s"g${k % 3}", s"u${k % 10}"))
        .toDF("k", "grp", "u").createOrReplaceTempView("mvcd_src")
      s.sql("CREATE TABLE mvcd_base KEY k FILES 4 AS SELECT * FROM mvcd_src")
        .collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvcd AS
          |SELECT grp, count(*) AS n, count(DISTINCT u) AS nu
          |FROM mvcd_base GROUP BY grp""".stripMargin).collect()
      def fromScratch() = s.sql(
        """SELECT grp, count(*) AS n, count(DISTINCT u) AS nu
          |FROM mvcd_base GROUP BY grp ORDER BY grp""".stripMargin)
        .collect().toSeq
      def mvRows() = s.sql("SELECT grp, n, nu FROM mvcd ORDER BY grp")
        .collect().toSeq
      mvRows() shouldBe fromScratch()
      // NULL values never count (SQL count(DISTINCT) semantics)
      s.sql("INSERT INTO mvcd_base SELECT k + 200 AS k, 'g0' AS grp, " +
        "CAST(NULL AS STRING) AS u FROM mvcd_src WHERE k <= 2").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcd").collect()
      mvRows() shouldBe fromScratch()
      // decrement WITHOUT death: one of g0's two u5 rows dies — reach holds
      s.sql("DELETE FROM mvcd_base WHERE k = 15").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcd").collect()
      mvRows() shouldBe fromScratch()
      mvRows().find(_.getString(0) == "g0").get.getLong(2) shouldBe 10L
      // value DEATH: the last u5 row in g0 dies — reach drops
      s.sql("DELETE FROM mvcd_base WHERE k = 45").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcd").collect()
      mvRows() shouldBe fromScratch()
      mvRows().find(_.getString(0) == "g0").get.getLong(2) shouldBe 9L
      // value BIRTH via in-place update (pre-image decrements u6, post-
      // image births 'fresh' — one interval, both transitions)
      s.sql("UPDATE mvcd_base SET u = 'fresh' WHERE k = 6").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcd").collect()
      mvRows() shouldBe fromScratch()
      mvRows().find(_.getString(0) == "g0").get.getLong(2) shouldBe 10L
      // group MOVE carries reach across groups; a second refresh no-ops
      s.sql("UPDATE mvcd_base SET grp = 'g1' WHERE grp = 'g0' AND k <= 12")
        .collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcd").collect()
      val r = s.sql("REFRESH MATERIALIZED VIEW mvcd").collect()(0)
      r.getInt(1) shouldBe r.getInt(2)
      mvRows() shouldBe fromScratch()
      // group DEATH deletes state; rebirth recounts from zero
      s.sql("DELETE FROM mvcd_base WHERE grp = 'g2'").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcd").collect()
      mvRows() shouldBe fromScratch()
      mvRows().map(_.getString(0)) should not contain "g2"
      s.sql("INSERT INTO mvcd_base SELECT k + 300 AS k, 'g2' AS grp, " +
        "'back' AS u FROM mvcd_src WHERE k <= 3").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcd").collect()
      mvRows() shouldBe fromScratch()
      mvRows().find(_.getString(0) == "g2").get.getLong(2) shouldBe 1L
    }
  }

  test("materialized views: REFRESH FULL rebuilds in place and repairs drift") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 30L).map(k => (k, s"g${k % 3}", k.toDouble))
        .toDF("k", "grp", "v").createOrReplaceTempView("mvf_src")
      s.sql("CREATE TABLE mvf_base KEY k AS SELECT * FROM mvf_src").collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvf AS
          |SELECT grp, count(*) AS n, max(v) AS hi
          |FROM mvf_base GROUP BY grp""".stripMargin).collect()
      def mv() = s.sql("SELECT grp, n, hi FROM mvf ORDER BY grp")
        .collect().toSeq
      def scratch() = s.sql(
        """SELECT grp, count(*) AS n, max(v) AS hi FROM mvf_base
          |GROUP BY grp ORDER BY grp""".stripMargin).collect().toSeq
      s.sql("DELETE FROM mvf_base WHERE k = 30").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvf").collect()
      mv() shouldBe scratch()
      // FULL on a HEALTHY view: a plain rebuild, same content, fresh pin
      val oldState = graft.sources.LakeMv.parseDef(
        graft.sources.LakeCatalog.lookupMv(s, "mvf").get).stateRoot
      val r = s.sql("REFRESH MATERIALIZED VIEW mvf FULL").collect()(0)
      r.getInt(2) shouldBe 1 // pinned at the base's current version (v1)
      mv() shouldBe scratch()
      val newState = graft.sources.LakeMv.parseDef(
        graft.sources.LakeCatalog.lookupMv(s, "mvf").get).stateRoot
      newState should not be oldState // fresh root; old stays addressable
      s.sql(s"SELECT count(*) FROM graft_lake('$oldState')").collect()(0)
        .getLong(0) shouldBe 3L
      // out-of-band CORRUPTION of the state table: reads serve garbage
      // the incremental fold can neither see nor fix — FULL repairs it
      s.sql(s"UPDATE graft_lake('$newState') SET n = n + 5 " +
        "WHERE grp = 'g0'").collect()
      mv() should not be scratch()
      s.sql("DELETE FROM mvf_base WHERE k = 29").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvf").collect()
      mv() should not be scratch() // incremental folds ON TOP of garbage
      s.sql("REFRESH MATERIALIZED VIEW mvf FULL").collect()
      mv() shouldBe scratch()
      // incremental refresh keeps working after the swap
      s.sql("DELETE FROM mvf_base WHERE k = 28").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvf").collect()
      mv() shouldBe scratch()
      // FULL on an unbound / non-MV name refuses
      intercept[Exception] {
        s.sql("REFRESH MATERIALIZED VIEW mvf_base FULL").collect()
      }.getMessage should include("no materialized view")
    }
  }

  test("materialized views: crash between side-table and main commits retries to convergence") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 30L).map(k => (k, s"g${k % 3}", s"u${k % 5}"))
        .toDF("k", "grp", "u").createOrReplaceTempView("mvx2_src")
      s.sql("CREATE TABLE mvx2_base KEY k AS SELECT * FROM mvx2_src")
        .collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvx2 AS
          |SELECT grp, count(*) AS n, count(DISTINCT u) AS nu
          |FROM mvx2_base GROUP BY grp""".stripMargin).collect()
      def mv() = s.sql("SELECT grp, n, nu FROM mvx2 ORDER BY grp")
        .collect().toSeq
      def scratch() = s.sql(
        """SELECT grp, count(*) AS n, count(DISTINCT u) AS nu
          |FROM mvx2_base GROUP BY grp ORDER BY grp""".stripMargin)
        .collect().toSeq
      val before = mv()
      // a mutation with value DEATHS, then a refresh that dies in the
      // exact window the side tables' own epoch chains exist for: AFTER
      // the count(DISTINCT) fold committed, BEFORE the main state merge
      s.sql("DELETE FROM mvx2_base WHERE u = 'u2'").collect()
      graft.sources.LakeMv.failBeforeMainMerge = true
      try {
        intercept[RuntimeException] {
          s.sql("REFRESH MATERIALIZED VIEW mvx2").collect()
        }.getMessage should include("injected crash")
      } finally graft.sources.LakeMv.failBeforeMainMerge = false
      mv() shouldBe before // main state untouched by the dead refresh
      // the RETRY must skip the already-applied side fold (its epoch is
      // ahead of the main chain's) and still land exactly from-scratch
      s.sql("REFRESH MATERIALIZED VIEW mvx2").collect()
      mv() shouldBe scratch()
      // and the chains are back in lockstep: another interval folds clean
      s.sql("DELETE FROM mvx2_base WHERE k = 7").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvx2").collect()
      mv() shouldBe scratch()
    }
  }

  test("materialized views: OPTIMIZE compacts state + side tables, bookkeeping survives") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 40L).map(k => (k, s"g${k % 4}", s"u${k % 6}"))
        .toDF("k", "grp", "u").createOrReplaceTempView("mvo_src")
      s.sql("CREATE TABLE mvo_base KEY k AS SELECT * FROM mvo_src").collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvo AS
          |SELECT grp, count(*) AS n, count(DISTINCT u) AS nu
          |FROM mvo_base GROUP BY grp""".stripMargin).collect()
      def mv() = s.sql("SELECT grp, n, nu FROM mvo ORDER BY grp")
        .collect().toSeq
      def scratch() = s.sql(
        """SELECT grp, count(*) AS n, count(DISTINCT u) AS nu
          |FROM mvo_base GROUP BY grp ORDER BY grp""".stripMargin)
        .collect().toSeq
      // several fold rounds accrue state/side files
      for (k <- Seq(1L, 2L, 3L, 4L)) {
        s.sql(s"DELETE FROM mvo_base WHERE k = $k").collect()
        s.sql("REFRESH MATERIALIZED VIEW mvo").collect()
      }
      mv() shouldBe scratch()
      val rows = s.sql("OPTIMIZE MATERIALIZED VIEW mvo FILES 2").collect()
      rows.map(_.getString(0)).toSeq shouldBe Seq("state", "distinct:nu")
      mv() shouldBe scratch() // compaction is content-invariant
      // the epoch bookkeeping survives the rewrite-only commits: the
      // next refresh is still INCREMENTAL (one-commit span), not a
      // from-init refold or a refusal
      s.sql("DELETE FROM mvo_base WHERE k = 5").collect()
      val r = s.sql("REFRESH MATERIALIZED VIEW mvo").collect()(0)
      r.getInt(2) - r.getInt(1) shouldBe 1
      mv() shouldBe scratch()
      intercept[Exception] {
        s.sql("OPTIMIZE MATERIALIZED VIEW mvo_base").collect()
      }.getMessage should include("no materialized view")
    }
  }

  test("materialized views: refusal surface and drop semantics") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 20L).map(k => (k, s"g${k % 3}", k * 1.5))
        .toDF("k", "grp", "v").createOrReplaceTempView("mvr_src")
      s.sql("CREATE TABLE mvr_base KEY k AS SELECT * FROM mvr_src").collect()
      s.sql("CREATE VIEW mvr_view AS SELECT * FROM mvr_base").collect()
      // count(*) is required (group liveness)
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW m1 AS SELECT grp, sum(v) AS sv " +
          "FROM mvr_base GROUP BY grp").collect()
      }.getMessage should include("count(*)")
      // a non-self-maintainable aggregate refuses with the reason (min/
      // max fold since round 16 — stddev is the representative refusal)
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW m1 AS SELECT grp, count(*) AS n, " +
          "stddev(v) AS sd FROM mvr_base GROUP BY grp").collect()
      }.getMessage should include("self-maintainable")
      // an expression group key's alias must not shadow a base column
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW m1 AS SELECT grp, k % 2 AS v, " +
          "count(*) AS n FROM mvr_base GROUP BY grp, k % 2").collect()
      }.getMessage should include("shadows a base table column")
      // HAVING must analyze against the declared read shape
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW m1 AS SELECT grp, count(*) AS n " +
          "FROM mvr_base GROUP BY grp HAVING no_such_col > 1").collect()
      }
      // a SIMPLE view folds through since r17 — but a view whose body is
      // richer than single-table SELECT/WHERE refuses with the reason
      s.sql("CREATE VIEW mvr_agg_view AS SELECT grp, count(*) AS c " +
        "FROM mvr_base GROUP BY grp").collect()
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW m1 AS SELECT grp, count(*) AS n " +
          "FROM mvr_agg_view GROUP BY grp").collect()
      }.getMessage should include("composes only through per-row views")
      s.sql("DROP VIEW mvr_agg_view").collect()
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW m1 AS SELECT grp, count(*) AS n " +
          "FROM nowhere GROUP BY grp").collect()
      }.getMessage should include("not a lake table")
      // bare select columns must equal GROUP BY exactly
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW m1 AS SELECT grp, k, count(*) AS n " +
          "FROM mvr_base GROUP BY grp").collect()
      }.getMessage should include("GROUP BY")
      // ...and a failed CREATE leaks no binding
      s.sql("SELECT count(*) FROM graft_catalog()").collect()(0)
        .getLong(0) shouldBe 2L
      s.sql("CREATE MATERIALIZED VIEW m_ok AS SELECT grp, count(*) AS n " +
        "FROM mvr_base GROUP BY grp").collect()
      // MV names refuse every write/storage/pin verb with MV guidance
      intercept[Exception] {
        s.sql("INSERT INTO m_ok SELECT 'g9' AS grp, 1L AS n").collect()
      }.getMessage should include("MATERIALIZED VIEW")
      intercept[Exception] {
        s.sql("UPDATE m_ok SET n = 0 WHERE grp = 'g0'").collect()
      }.getMessage should include("REFRESH MATERIALIZED VIEW")
      intercept[Exception] {
        s.sql("OPTIMIZE m_ok BINPACK 10").collect()
      }.getMessage should include("MATERIALIZED VIEW")
      // VERSION AS OF on an MV is a supported pinned read since round 17
      // (covered by its own test — here just that it is no refusal)
      s.sql("SELECT * FROM m_ok VERSION AS OF 0").collect().length shouldBe 3
      intercept[Exception] {
        s.sql("SELECT * FROM graft_lake_history('m_ok')").collect()
      }.getMessage should include("MATERIALIZED VIEW")
      // cross-kind DROPs route to the right verb
      intercept[Exception] {
        s.sql("DROP TABLE m_ok").collect()
      }.getMessage should include("DROP MATERIALIZED VIEW m_ok")
      intercept[Exception] {
        s.sql("DROP VIEW m_ok").collect()
      }.getMessage should include("DROP MATERIALIZED VIEW m_ok")
      intercept[Exception] {
        s.sql("DROP MATERIALIZED VIEW mvr_base").collect()
      }.getMessage should include("DROP TABLE mvr_base")
      // REFRESH of a non-MV refuses with the kind
      intercept[Exception] {
        s.sql("REFRESH MATERIALIZED VIEW mvr_base").collect()
      }.getMessage should include("no materialized view")
      // DROP returns the state root; the state stays addressable there
      val dropped = s.sql("DROP MATERIALIZED VIEW m_ok").collect()(0)
      val stateRoot = dropped.getString(1)
      s.sql(s"SELECT count(*) FROM graft_lake('$stateRoot')").collect()(0)
        .getLong(0) shouldBe 3L // g0, g1, g2
      intercept[Exception] { s.sql("SELECT * FROM m_ok").collect() }
      // IF EXISTS on an unbound MV no-ops; bare form refuses
      s.sql("DROP MATERIALIZED VIEW IF EXISTS m_ok").collect()(0)
        .getString(1) shouldBe ""
      intercept[Exception] {
        s.sql("DROP MATERIALIZED VIEW m_ok").collect()
      }.getMessage should include("no materialized view")
    }
  }

  /** Collect every executed plan of `body`'s Spark actions on session
    * `s` (the listener bus is async, so the capture waits for quiesce). */
  private def capturedPlans(s: SparkSession)(body: => Unit): Seq[String] = {
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    try {
      body
      var size = -1
      var stable = 0
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (stable < 2 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        val n = plans.size()
        if (n == size) stable += 1 else { stable = 0; size = n }
      }
    } finally s.listenerManager.unregister(listener)
    import scala.jdk.CollectionConverters._
    plans.asScala.toSeq
  }

  test("materialized views: refresh broadcast hints are size-gated — budget 0 folds via shuffle, bit-identical state") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 60L).map(k => (k, s"g${k % 3}", k.toDouble, s"u${k % 7}"))
        .toDF("k", "grp", "v", "u").createOrReplaceTempView("mvbg_src")
      s.sql("CREATE TABLE mvbg_base KEY k FILES 3 AS SELECT * FROM mvbg_src")
        .collect()
      // min + count(DISTINCT) + sum: every gated join site participates
      // (delta slice, old-state slice, rescan scope + aggregate, side
      // delta, side slice, recount override)
      s.sql(
        """CREATE MATERIALIZED VIEW mvbg AS
          |SELECT grp, count(*) AS n, sum(v) AS sv, min(v) AS lo,
          |       count(DISTINCT u) AS nu
          |FROM mvbg_base GROUP BY grp""".stripMargin).collect()
      def mv() = s.sql(
        "SELECT grp, n, CAST(sv AS DECIMAL(28,10)) AS sv, lo, nu FROM mvbg " +
          "ORDER BY grp").collect().toSeq
      def scratch() = s.sql(
        """SELECT grp, count(*) AS n,
          |CAST(sum(CAST(v AS DECIMAL(28,10))) AS DECIMAL(28,10)) AS sv,
          |min(v) AS lo, count(DISTINCT u) AS nu
          |FROM mvbg_base GROUP BY grp ORDER BY grp""".stripMargin)
        .collect().toSeq
      // an extremum-tying delete (min of g0 is v=3) plus distinct-value
      // deaths: the fold, the rescan, AND the side fold all run
      s.sql("DELETE FROM mvbg_base WHERE k = 3").collect()
      s.sql("DELETE FROM mvbg_base WHERE u = 'u2'").collect()
      // budget 0 withholds every refresh hint; the auto-broadcast
      // thresholds go to -1 too — at this scale Spark's own size
      // estimate would still broadcast the tiny delta, masking whether a
      // hint is welded in. With BOTH off, any remaining
      // BroadcastHashJoin in the fold IS a welded hint. (The manifest
      // file-pruning range join stays a hinted BroadcastNestedLoopJoin —
      // it is metadata-sized by construction, built FROM the driver-held
      // manifest, so it is not a scale cliff and not under this gate.)
      s.conf.set("spark.graft.mv.broadcastMaxRows", "0")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val shuffled =
        try capturedPlans(s) {
          s.sql("REFRESH MATERIALIZED VIEW mvbg").collect()
        } finally {
          s.conf.unset("spark.graft.mv.broadcastMaxRows")
          s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
          s.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        }
      shuffled should not be empty
      withClue("welded broadcast hint survived budget 0:\n" +
          shuffled.filter(_.contains("BroadcastHashJoin")).mkString("\n")) {
        shuffled.exists(_.contains("BroadcastHashJoin")) shouldBe false
      }
      graft.sources.LakeMv.lastRescanGroups should be > 0L // rescan ran un-hinted
      mv() shouldBe scratch() // the shuffle fold lands the same state
      // control at the DEFAULT budget: the same machinery broadcasts
      // (delta-sized relations at refresh cadence — the right plan), so
      // the capture really sees the fold's joins
      s.sql("DELETE FROM mvbg_base WHERE u = 'u3'").collect()
      val hinted = capturedPlans(s) {
        s.sql("REFRESH MATERIALIZED VIEW mvbg").collect()
      }
      hinted.exists(_.contains("BroadcastHashJoin")) shouldBe true
      mv() shouldBe scratch()
    }
  }

  test("materialized views: crash retry converges even when base commits land in between") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 30L).map(k => (k, s"g${k % 3}", s"u${k % 5}"))
        .toDF("k", "grp", "u").createOrReplaceTempView("mvx3_src")
      s.sql("CREATE TABLE mvx3_base KEY k AS SELECT * FROM mvx3_src")
        .collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvx3 AS
          |SELECT grp, count(*) AS n, count(DISTINCT u) AS nu
          |FROM mvx3_base GROUP BY grp""".stripMargin).collect()
      def mv() = s.sql("SELECT grp, n, nu FROM mvx3 ORDER BY grp")
        .collect().toSeq
      def scratch() = s.sql(
        """SELECT grp, count(*) AS n, count(DISTINCT u) AS nu
          |FROM mvx3_base GROUP BY grp ORDER BY grp""".stripMargin)
        .collect().toSeq
      // crash AFTER the side-table commit, BEFORE the main merge …
      s.sql("DELETE FROM mvx3_base WHERE u = 'u2'").collect()
      graft.sources.LakeMv.failBeforeMainMerge = true
      try {
        intercept[RuntimeException] {
          s.sql("REFRESH MATERIALIZED VIEW mvx3").collect()
        }.getMessage should include("injected crash")
      } finally graft.sources.LakeMv.failBeforeMainMerge = false
      // … and then MORE base commits land before anyone retries — the
      // production crash-recovery shape (writers do not wait for a dead
      // refresher). The side table sits at epoch e with last < e < cur;
      // the retry must fold the side's still-missing (e, cur] slice and
      // the main fold's full (last, cur] interval, and converge — not
      // refuse with a drift diagnosis (which would misname the cause and
      // force an O(base) FULL rebuild).
      s.sql("DELETE FROM mvx3_base WHERE u = 'u4'").collect()
      s.sql("INSERT INTO mvx3_base SELECT k + 100 AS k, 'g9' AS grp, " +
        "'u7' AS u FROM mvx3_src WHERE k <= 4").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvx3").collect()
      mv() shouldBe scratch()
      // chains back in lockstep: the next interval folds clean
      s.sql("DELETE FROM mvx3_base WHERE k = 7").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvx3").collect()
      mv() shouldBe scratch()
    }
  }

  test("materialized views: alias collisions are case-insensitive, like resolution") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 10L).map(k => (k, s"g${k % 2}", s"u${k % 3}"))
        .toDF("k", "grp", "u").createOrReplaceTempView("mvci_src")
      s.sql("CREATE TABLE mvci_base KEY k AS SELECT * FROM mvci_src")
        .collect()
      // `AS A` + `AS a` would resolve ambiguously AND derive the same
      // count(DISTINCT) side-table root (auxRoot lowercases) — refused
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW mci AS SELECT grp, count(*) AS n, " +
          "count(DISTINCT u) AS A, count(DISTINCT k) AS a " +
          "FROM mvci_base GROUP BY grp").collect()
      }.getMessage should include("duplicate aggregate aliases")
      // a group key and an alias differing only by case collide too
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW mci AS SELECT grp, count(*) AS GRP " +
          "FROM mvci_base GROUP BY grp").collect()
      }.getMessage should include("collides with a GROUP BY key")
      // neither failed CREATE leaked a binding
      s.sql("SELECT count(*) FROM graft_catalog()").collect()(0)
        .getLong(0) shouldBe 1L
    }
  }

  test("materialized views: SHOW CREATE after RENAME emits a statement that recreates the NEW name") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 12L).map(k => (k, s"g${k % 3}")).toDF("k", "grp")
        .createOrReplaceTempView("mvsc_src")
      s.sql("CREATE TABLE mvsc_base KEY k AS SELECT * FROM mvsc_src")
        .collect()
      s.sql("CREATE MATERIALIZED VIEW mvsc AS SELECT grp, count(*) AS n " +
        "FROM mvsc_base GROUP BY grp").collect()
      s.sql("ALTER MATERIALIZED VIEW mvsc RENAME TO mvsc2").collect()
      val stmt = s.sql("SHOW CREATE TABLE mvsc2").collect()(0).getString(1)
      stmt should include("MATERIALIZED VIEW mvsc2 ")
      stmt should not include "VIEW mvsc "
      // the emitted statement really recreates the binding being shown
      s.sql("DROP MATERIALIZED VIEW mvsc2").collect()
      s.sql(stmt).collect()
      s.sql("SELECT count(*) FROM mvsc2").collect()(0).getLong(0) shouldBe 3L
      // and the rename still pins the refresh bookkeeping (incremental,
      // not a from-init refold)
      s.sql("DELETE FROM mvsc_base WHERE k = 1").collect()
      val r = s.sql("REFRESH MATERIALIZED VIEW mvsc2").collect()(0)
      r.getInt(2) - r.getInt(1) shouldBe 1
    }
  }

  test("materialized views × base schema evolution: unreferenced changes fold; referenced ones refuse with repair guidance") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 30L).map(k => (k, s"g${k % 3}", k.toDouble, s"x$k"))
        .toDF("k", "grp", "v", "extra").createOrReplaceTempView("mvse_src")
      s.sql("CREATE TABLE mvse_base KEY k AS SELECT * FROM mvse_src")
        .collect()
      val root = graft.sources.LakeCatalog.lookup(s, "mvse_base").get
      s.sql(
        """CREATE MATERIALIZED VIEW mvse AS
          |SELECT grp, count(*) AS n, sum(v) AS sv, max(v) AS hi
          |FROM mvse_base GROUP BY grp""".stripMargin).collect()
      def mv() = s.sql(
        "SELECT grp, n, CAST(sv AS DECIMAL(28,10)) AS sv, hi FROM mvse " +
          "ORDER BY grp").collect().toSeq
      def scratch() = s.sql(
        """SELECT grp, count(*) AS n,
          |CAST(sum(CAST(v AS DECIMAL(28,10))) AS DECIMAL(28,10)) AS sv,
          |max(v) AS hi FROM mvse_base GROUP BY grp ORDER BY grp"""
          .stripMargin).collect().toSeq
      // rename + drop of UNREFERENCED columns between refreshes: the
      // fold follows the view's own references and lands from-scratch
      s.sql(s"ALTER TABLE graft_lake('$root') RENAME COLUMN extra TO extra2")
        .collect()
      s.sql("DELETE FROM mvse_base WHERE k = 1").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvse").collect()
      mv() shouldBe scratch()
      s.sql(s"ALTER TABLE graft_lake('$root') DROP COLUMN extra2").collect()
      s.sql("DELETE FROM mvse_base WHERE k = 2").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvse").collect()
      mv() shouldBe scratch()
      // rename of a REFERENCED column: the definition no longer
      // analyzes — refuse BEFORE any fold work, with re-CREATE guidance
      // (FULL cannot repair a definition naming a missing column)
      s.sql(s"ALTER TABLE graft_lake('$root') RENAME COLUMN v TO v2")
        .collect()
      s.sql("DELETE FROM mvse_base WHERE k = 3").collect()
      val eRename = intercept[Exception] {
        s.sql("REFRESH MATERIALIZED VIEW mvse").collect()
      }.getMessage
      eRename should include("no longer analyzes")
      eRename should include("re-CREATE")
      // FULL refuses too (the rebuild's CREATE-probe fails the same
      // way) and loses nothing: the old binding is restored
      intercept[Exception] {
        s.sql("REFRESH MATERIALIZED VIEW mvse FULL").collect()
      }
      graft.sources.LakeCatalog.kindOf(s, "mvse") shouldBe "materialized_view"
      // renaming BACK repairs in place — the fold resumes and catches up
      // on everything that happened while the name was broken
      s.sql(s"ALTER TABLE graft_lake('$root') RENAME COLUMN v2 TO v")
        .collect()
      s.sql("REFRESH MATERIALIZED VIEW mvse").collect()
      mv() shouldBe scratch()
      // drop of a REFERENCED column: same refusal family
      s.sql(s"ALTER TABLE graft_lake('$root') DROP COLUMN v").collect()
      intercept[Exception] {
        s.sql("REFRESH MATERIALIZED VIEW mvse").collect()
      }.getMessage should include("no longer analyzes")
      s.sql("DROP MATERIALIZED VIEW mvse").collect()
    }
  }

  test("namespaced names: ns.table lifecycle, scoping, shadowing, delegation") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 30L).map(k => (k, s"g${k % 3}", k * 2.0))
        .toDF("k", "grp", "v").createOrReplaceTempView("nsq_src")
      // full lifecycle under a two-part name
      s.sql("CREATE TABLE sales.orders KEY k AS SELECT * FROM nsq_src")
        .collect()
      s.sql("SELECT count(*) FROM sales.orders").collect()(0)
        .getLong(0) shouldBe 30L
      // the relation aliases as its LAST part, like Spark's db.table
      s.sql("SELECT orders.k FROM sales.orders WHERE orders.k = 3")
        .collect()(0).getLong(0) shouldBe 3L
      s.sql("UPDATE sales.orders SET v = 0.0 WHERE k = 1").collect()
      s.sql("INSERT INTO sales.orders SELECT k + 100 AS k, 'g9' AS grp, " +
        "1.0D AS v FROM nsq_src WHERE k <= 2").collect()
      s.sql("DELETE FROM sales.orders WHERE k = 2").collect()
      s.sql("SELECT count(*) FROM sales.orders").collect()(0)
        .getLong(0) shouldBe 31L
      // the SAME bare name is a DIFFERENT binding — no cross-shadowing
      s.sql("CREATE TABLE orders KEY k AS SELECT * FROM nsq_src WHERE k <= 5")
        .collect()
      s.sql("SELECT count(*) FROM orders").collect()(0).getLong(0) shouldBe 5L
      s.sql("SELECT count(*) FROM sales.orders").collect()(0)
        .getLong(0) shouldBe 31L
      // views and MVs namespace the same way
      s.sql("CREATE VIEW sales.big AS SELECT * FROM sales.orders " +
        "WHERE v >= 40.0").collect()
      s.sql("SELECT count(*) FROM sales.big").collect()(0).getLong(0) should be > 0L
      s.sql("CREATE MATERIALIZED VIEW sales.by_grp AS " +
        "SELECT grp, count(*) AS n FROM sales.orders GROUP BY grp").collect()
      s.sql("DELETE FROM sales.orders WHERE k = 3").collect()
      s.sql("REFRESH MATERIALIZED VIEW sales.by_grp").collect()
      s.sql("SELECT grp, n FROM sales.by_grp ORDER BY grp").collect().toSeq shouldBe
        s.sql("SELECT grp, count(*) AS n FROM sales.orders GROUP BY grp " +
          "ORDER BY grp").collect().toSeq
      // catalog statements speak the namespace
      s.sql("SHOW TABLES IN sales").collect().map(_.getString(0)).toSeq
        .sorted shouldBe Seq("sales.big", "sales.by_grp", "sales.orders")
      s.sql("SHOW TABLES").collect().map(_.getString(0)).toSeq should
        contain("orders")
      s.sql("DESCRIBE sales.orders").collect().map(_.getString(0)) should
        contain("root")
      s.sql("SHOW CREATE TABLE sales.orders").collect()(0).getString(1) should
        include("CREATE TABLE sales.orders")
      // rename moves bindings ACROSS namespaces (metadata-only)
      s.sql("ALTER TABLE sales.orders RENAME TO archive.orders").collect()
      s.sql("SELECT count(*) FROM archive.orders").collect()(0)
        .getLong(0) shouldBe 30L
      intercept[Exception] {
        s.sql("SELECT * FROM sales.orders").collect()
      }
      // the MV keeps working through ITS name (it pins the base ROOT,
      // not the name — renames never orphan it)
      s.sql("DELETE FROM archive.orders WHERE k = 4").collect()
      s.sql("REFRESH MATERIALIZED VIEW sales.by_grp").collect()
      s.sql("SELECT sum(n) FROM sales.by_grp").collect()(0)
        .getLong(0) shouldBe 29L
      // delegation: unbound namespaces stay Spark's — both SHOW and read
      intercept[Exception] {
        s.sql("SHOW TABLES IN no_such_ns").collect()
      }.getMessage.toLowerCase should include("schema")
      intercept[Exception] {
        s.sql("SELECT * FROM no_such_ns.t").collect()
      }.getMessage should include("TABLE_OR_VIEW_NOT_FOUND")
      // three-part names are never ours
      intercept[Exception] {
        s.sql("SELECT * FROM cat.db.t").collect()
      }
      // DROP by qualified name
      s.sql("DROP MATERIALIZED VIEW sales.by_grp").collect()
      s.sql("DROP VIEW sales.big").collect()
      s.sql("DROP TABLE archive.orders").collect()
      s.sql("SHOW TABLES").collect().map(_.getString(0)).toSeq shouldBe
        Seq("orders")
    }
  }

  test("materialized views: VERSION AS OF pins a base version, TIMESTAMP AS OF the wall clock") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 20L).map(k => (k, s"g${k % 2}")).toDF("k", "grp")
        .createOrReplaceTempView("mvtt_src")
      s.sql("CREATE TABLE mvtt_base KEY k AS SELECT * FROM mvtt_src")
        .collect() // base v0
      s.sql("DELETE FROM mvtt_base WHERE k = 20").collect() // base v1
      // the MV pins init at base v1 — so v0 predates the view entirely
      s.sql("CREATE MATERIALIZED VIEW mvtt AS SELECT grp, count(*) AS n " +
        "FROM mvtt_base GROUP BY grp").collect()
      def at(v: Int) = s.sql(
        s"SELECT grp, n FROM mvtt VERSION AS OF $v ORDER BY grp")
        .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
      val atBuild = Seq(("g0", 9L), ("g1", 10L))
      s.sql("DELETE FROM mvtt_base WHERE k = 2").collect() // base v2
      s.sql("REFRESH MATERIALIZED VIEW mvtt").collect() // folded to 2
      Thread.sleep(5)
      // ISO-8601 instant: castable by Spark's own time-travel validation
      // (which runs before the graft rule) AND parseable by the lake
      val tsAfterFirst =
        java.time.Instant.ofEpochMilli(System.currentTimeMillis()).toString
      Thread.sleep(5)
      s.sql("DELETE FROM mvtt_base WHERE k = 4").collect() // base v3
      s.sql("REFRESH MATERIALIZED VIEW mvtt").collect() // folded to 3
      s.sql("DELETE FROM mvtt_base WHERE k = 6").collect() // base v4, UNFOLDED
      // each pin serves what a reader saw while the base stood there
      at(1) shouldBe atBuild
      at(2) shouldBe Seq(("g0", 8L), ("g1", 10L))
      at(3) shouldBe Seq(("g0", 7L), ("g1", 10L))
      // between refreshes the view serves its last fold — the pin at the
      // unfolded base version reproduces that staleness contract
      at(4) shouldBe at(3)
      s.sql("SELECT grp, n FROM mvtt ORDER BY grp").collect().toSeq
        .map(r => (r.getString(0), r.getLong(1))) shouldBe at(3)
      // wall-clock pin: the state the view SERVED at that instant
      s.sql(s"SELECT grp, n FROM mvtt TIMESTAMP AS OF '$tsAfterFirst' " +
        "ORDER BY grp").collect().toSeq
        .map(r => (r.getString(0), r.getLong(1))) shouldBe at(2)
      // before the build there is nothing to serve
      intercept[Exception] {
        s.sql("SELECT * FROM mvtt VERSION AS OF 0").collect()
      }.getMessage should include("no state for base version")
      // catch-up refresh after the pins: pinned reads are stable history
      s.sql("REFRESH MATERIALIZED VIEW mvtt").collect() // folded to 4
      at(3) shouldBe Seq(("g0", 7L), ("g1", 10L))
      at(4) shouldBe Seq(("g0", 6L), ("g1", 10L))
    }
  }

  test("MV pinned reads follow dim-only refreshes; retention pins make VACUUM refuse") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 30L).map(k => (k, 1L + k % 3, k * 1.0)).toDF("k", "ck", "v")
        .createOrReplaceTempView("mvpn_fsrc")
      (1L to 3L).map(c => (c, s"seg${c % 2}")).toDF("c_id", "seg")
        .createOrReplaceTempView("mvpn_csrc")
      s.sql("CREATE TABLE mvpn_fact KEY k AS SELECT * FROM mvpn_fsrc")
        .collect() // fact v0 — the base version every pin below reads
      s.sql("CREATE TABLE mvpn_c KEY c_id AS SELECT * FROM mvpn_csrc")
        .collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvpn AS
          |SELECT seg, count(*) AS n
          |FROM mvpn_fact JOIN mvpn_c ON ck = c_id
          |GROUP BY seg""".stripMargin).collect()
      def at() = s.sql(
        "SELECT seg, n FROM mvpn VERSION AS OF 0 ORDER BY seg")
        .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
      def live() = s.sql("SELECT seg, n FROM mvpn ORDER BY seg")
        .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
      at() shouldBe live()
      // DIM-ONLY refresh: the base STANDS at v0 while the served content
      // changes — the pin follows what a reader actually saw, so it must
      // serve the newest dim-refreshed state, not the pre-dim one
      s.sql("UPDATE mvpn_c SET seg = 'segX' WHERE c_id = 2").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvpn").collect()
      at() shouldBe live()
      at().map(_._1) should contain("segX")
      // a fact fold PAST v0 brackets the pin: it keeps serving the
      // dim-refreshed content, never the newer fact fold
      val pinnedThen = at()
      s.sql("DELETE FROM mvpn_fact WHERE k <= 3").collect() // fact v1
      s.sql("REFRESH MATERIALIZED VIEW mvpn").collect()
      at() shouldBe pinnedThen
      live() should not be pinnedThen
      // RETENTION PIN: resolve + declare the floor, then a sweep that
      // would pass it refuses LOUDLY, naming the pin
      s.sql("ALTER MATERIALIZED VIEW mvpn PIN VERSION AS OF 0").collect()
      val detail0 = s.sql(
        "SELECT state_root, n_pins FROM graft_mv_detail('mvpn')")
        .collect()(0)
      val stateRoot = detail0.getString(0)
      detail0.getInt(1) shouldBe 1 // the declared pin is ops-visible
      s.sql("DELETE FROM mvpn_fact WHERE k = 10").collect() // fact v2
      s.sql("REFRESH MATERIALIZED VIEW mvpn").collect() // more state history
      val err = intercept[Exception] {
        s.sql(s"VACUUM graft_lake('$stateRoot') RETAIN 1 VERSIONS")
          .collect()
      }
      err.getMessage should include("retention pin")
      err.getMessage should include("mv-mvpn-base-v0")
      at() shouldBe pinnedThen // the refusal kept the pin servable
      // DROP PIN releases the floor; the same sweep proceeds
      s.sql("ALTER MATERIALIZED VIEW mvpn DROP PIN VERSION AS OF 0")
        .collect()
      s.sql("SELECT n_pins FROM graft_mv_detail('mvpn')")
        .collect()(0).getInt(0) shouldBe 0
      s.sql(s"VACUUM graft_lake('$stateRoot') RETAIN 1 VERSIONS").collect()
      live().map(_._1) should contain("segX") // live reads unharmed
      // a double DROP refuses — a typo'd drop must not silently succeed
      intercept[Exception] {
        s.sql("ALTER MATERIALIZED VIEW mvpn DROP PIN VERSION AS OF 0")
          .collect()
      }.getMessage should include("nothing to drop")
      // and the now-unpinned read REFUSES after the sweep instead of
      // silently serving state NEWER than the pinned base version (the
      // fold bracket below the horizon can no longer be proven)
      intercept[Exception] {
        s.sql("SELECT seg, n FROM mvpn VERSION AS OF 0 ORDER BY seg")
          .collect()
      }.getMessage should include("vacuumed")
    }
  }

  test("materialized views over a VIEW: fold-through stages, body pinning, refusals") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 40L).map(k => (k, s"g${k % 3}", k * 10.0, s"u${k % 7}"))
        .toDF("k", "grp", "v", "u").createOrReplaceTempView("mvvw_src")
      s.sql("CREATE TABLE mvvw_base KEY k AS SELECT * FROM mvvw_src")
        .collect()
      // projection (computed column) + filter view; the MV folds THROUGH
      s.sql(
        """CREATE VIEW mvvw_small AS
          |SELECT k, grp, u, v * 2 AS vv FROM mvvw_base
          |WHERE v < 300.0""".stripMargin).collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvvw AS
          |SELECT grp, count(*) AS n, sum(vv) AS sv, max(vv) AS hi,
          |       count(DISTINCT u) AS nu
          |FROM mvvw_small GROUP BY grp""".stripMargin).collect()
      def mv() = s.sql(
        "SELECT grp, n, CAST(sv AS DECIMAL(28,10)) AS sv, hi, nu " +
          "FROM mvvw ORDER BY grp").collect().toSeq
      def scratch() = s.sql(
        """SELECT grp, count(*) AS n,
          |CAST(sum(CAST(vv AS DECIMAL(28,10))) AS DECIMAL(28,10)) AS sv,
          |max(vv) AS hi, count(DISTINCT u) AS nu
          |FROM mvvw_small GROUP BY grp ORDER BY grp""".stripMargin)
        .collect().toSeq
      mv() shouldBe scratch()
      // rows cross the view's WHERE boundary in BOTH directions (exit:
      // +300, entry: -150), plus an extremum-tying delete through the
      // view's computed column
      s.sql("UPDATE mvvw_base SET v = v + 300.0 WHERE k % 10 = 1").collect()
      s.sql("UPDATE mvvw_base SET v = v - 150.0 WHERE k >= 31").collect()
      s.sql("DELETE FROM mvvw_base WHERE v >= 280.0 AND v < 300.0")
        .collect()
      s.sql("REFRESH MATERIALIZED VIEW mvvw").collect()
      mv() shouldBe scratch()
      val r2 = s.sql("REFRESH MATERIALIZED VIEW mvvw").collect()(0)
      r2.getInt(1) shouldBe r2.getInt(2) // no-op
      // the detail surface reports the view pin healthy …
      s.sql("SELECT view_pin_stale FROM graft_mv_detail('mvvw')")
        .collect()(0).getBoolean(0) shouldBe false
      // REDEFINING the pinned view refuses the incremental fold …
      s.sql("CREATE OR REPLACE VIEW mvvw_small AS " +
        "SELECT k, grp, u, v * 3 AS vv FROM mvvw_base WHERE v < 200.0")
        .collect()
      // … and the detail flips to stale BEFORE anyone refreshes (the
      // alert to wire, like n_dims_stale)
      s.sql("SELECT view_pin_stale FROM graft_mv_detail('mvvw')")
        .collect()(0).getBoolean(0) shouldBe true
      s.sql("DELETE FROM mvvw_base WHERE k = 2").collect()
      val e = intercept[Exception] {
        s.sql("REFRESH MATERIALIZED VIEW mvvw").collect()
      }.getMessage
      e should include("REDEFINED")
      e should include("REFRESH MATERIALIZED VIEW mvvw FULL")
      // … and FULL re-reads the CURRENT body, re-pins, and the
      // incremental fold resumes under the new shape
      s.sql("REFRESH MATERIALIZED VIEW mvvw FULL").collect()
      mv() shouldBe scratch()
      s.sql("DELETE FROM mvvw_base WHERE k = 3").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvvw").collect()
      mv() shouldBe scratch()
      // a DROPPED view refuses with re-CREATE guidance
      s.sql("DROP VIEW mvvw_small").collect()
      s.sql("DELETE FROM mvvw_base WHERE k = 4").collect()
      intercept[Exception] {
        s.sql("REFRESH MATERIALIZED VIEW mvvw").collect()
      }.getMessage should include("no longer bound as a view")
      s.sql("DROP MATERIALIZED VIEW mvvw").collect()
      // refusals: view-over-view, pre-aggregated view item, window item,
      // subquery WHERE — each with its mechanism named
      s.sql("CREATE VIEW mvvw_v1 AS SELECT k, grp, v FROM mvvw_base")
        .collect()
      s.sql("CREATE VIEW mvvw_v2 AS SELECT k, grp, v FROM mvvw_v1")
        .collect()
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW m2 AS SELECT grp, count(*) AS n " +
          "FROM mvvw_v2 GROUP BY grp").collect()
      }.getMessage should include("views over views")
      s.sql("CREATE VIEW mvvw_v3 AS SELECT max(v) AS mx FROM mvvw_base")
        .collect()
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW m2 AS SELECT mx, count(*) AS n " +
          "FROM mvvw_v3 GROUP BY mx").collect()
      }.getMessage should include("PRE-AGGREGATES")
      s.sql("CREATE VIEW mvvw_v4 AS SELECT k, grp, " +
        "row_number() OVER (PARTITION BY grp ORDER BY k) AS rn " +
        "FROM mvvw_base").collect()
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW m2 AS SELECT grp, count(*) AS n " +
          "FROM mvvw_v4 GROUP BY grp").collect()
      }.getMessage should include("WINDOW")
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW m2 AS SELECT grp, count(*) AS n " +
          "FROM mvvw_base WHERE k IN (SELECT k FROM mvvw_v1) GROUP BY grp")
          .collect()
      }.getMessage should include("SUBQUERY")
      // none of the failed CREATEs leaked a binding (base + 4 views)
      s.sql("SELECT count(*) FROM graft_catalog()").collect()(0)
        .getLong(0) shouldBe 5L
    }
  }

  test("materialized views: a fold-through VIEW composes with star-join dims") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 50L).map(k => (k, 1L + k % 4, k * 10.0))
        .toDF("k", "ck", "v").createOrReplaceTempView("mvvd_fsrc")
      (1L to 4L).map(c => (c, s"seg${c % 2}"))
        .toDF("c_id", "seg").createOrReplaceTempView("mvvd_dsrc")
      s.sql("CREATE TABLE mvvd_fact KEY k AS SELECT * FROM mvvd_fsrc")
        .collect()
      s.sql("CREATE TABLE mvvd_dim KEY c_id AS SELECT * FROM mvvd_dsrc")
        .collect()
      s.sql("CREATE VIEW mvvd_small AS SELECT k, ck, v * 2 AS vv " +
        "FROM mvvd_fact WHERE v < 400.0").collect()
      // view stage FIRST (projection + filter), then the pinned dim join
      // ON a view-output column, then the MV's own WHERE over both
      s.sql(
        """CREATE MATERIALIZED VIEW mvvd AS
          |SELECT seg, count(*) AS n, sum(vv) AS sv
          |FROM mvvd_small JOIN mvvd_dim ON ck = c_id
          |WHERE k % 2 = 0
          |GROUP BY seg""".stripMargin).collect()
      def mv() = s.sql(
        "SELECT seg, n, CAST(sv AS DECIMAL(28,10)) AS sv FROM mvvd " +
          "ORDER BY seg").collect().toSeq
      def scratch() = s.sql(
        """SELECT seg, count(*) AS n,
          |CAST(sum(CAST(vv AS DECIMAL(28,10))) AS DECIMAL(28,10)) AS sv
          |FROM mvvd_small JOIN mvvd_dim ON ck = c_id
          |WHERE k % 2 = 0 GROUP BY seg ORDER BY seg""".stripMargin)
        .collect().toSeq
      mv() shouldBe scratch()
      // fact DML crossing the view boundary AND moving dim membership
      s.sql("UPDATE mvvd_fact SET v = v + 300.0 WHERE k % 5 = 0").collect()
      s.sql("UPDATE mvvd_fact SET ck = 1 + (ck % 4) WHERE k % 7 = 0")
        .collect()
      s.sql("DELETE FROM mvvd_fact WHERE k = 8").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvvd").collect()
      mv() shouldBe scratch()
      // a dim write folds incrementally THROUGH the view stage too (the
      // dim phase joins the view-projected fact snapshot)
      s.sql("UPDATE mvvd_dim SET seg = 'seg9' WHERE c_id = 2").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvvd").collect()
      mv() shouldBe scratch()
      s.sql("CREATE OR REPLACE VIEW mvvd_small AS SELECT k, ck, v AS vv " +
        "FROM mvvd_fact").collect()
      s.sql("DELETE FROM mvvd_fact WHERE k = 9").collect()
      intercept[Exception] {
        s.sql("REFRESH MATERIALIZED VIEW mvvd").collect()
      }.getMessage should include("REDEFINED")
      s.sql("REFRESH MATERIALIZED VIEW mvvd FULL").collect()
      mv() shouldBe scratch() // new body + re-pinned dim, one repair verb
    }
  }

  test("star-join MVs: dim deltas fold as bilinear phases, crash retries converge per chain") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 60L).map(k => (k, 1L + k % 5, 1L + k % 3, k * 10.0))
        .toDF("k", "ck", "pk", "v").createOrReplaceTempView("mvbl_fsrc")
      (1L to 5L).map(c => (c, s"seg${c % 2}"))
        .toDF("c_id", "seg").createOrReplaceTempView("mvbl_csrc")
      (1L to 3L).map(p => (p, s"cat${p % 2}"))
        .toDF("p_id", "cat").createOrReplaceTempView("mvbl_psrc")
      s.sql("CREATE TABLE mvbl_fact KEY k AS SELECT * FROM mvbl_fsrc")
        .collect()
      s.sql("CREATE TABLE mvbl_c KEY c_id AS SELECT * FROM mvbl_csrc")
        .collect()
      s.sql("CREATE TABLE mvbl_p KEY p_id AS SELECT * FROM mvbl_psrc")
        .collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvbl AS
          |SELECT seg, cat, count(*) AS n, sum(v) AS sv, max(v) AS hi,
          |       count(DISTINCT ck) AS nc
          |FROM mvbl_fact JOIN mvbl_c ON ck = c_id JOIN mvbl_p ON pk = p_id
          |GROUP BY seg, cat""".stripMargin).collect()
      def mv() = s.sql(
        "SELECT seg, cat, n, CAST(sv AS DECIMAL(28,10)) AS sv, hi, nc " +
          "FROM mvbl ORDER BY seg, cat").collect().toSeq
      def scratch() = s.sql(
        """SELECT seg, cat, count(*) AS n,
          |CAST(sum(CAST(v AS DECIMAL(28,10))) AS DECIMAL(28,10)) AS sv,
          |max(v) AS hi, count(DISTINCT ck) AS nc
          |FROM mvbl_fact JOIN mvbl_c ON ck = c_id JOIN mvbl_p ON pk = p_id
          |GROUP BY seg, cat ORDER BY seg, cat""".stripMargin)
        .collect().toSeq
      mv() shouldBe scratch()
      // a MIXED interval — fact commits interleaved with BOTH dims
      // changing — folds in one refresh: per-dim phases bracket the fact
      // at its old version, the fact phase sees all-new dims
      s.sql("INSERT INTO mvbl_fact SELECT k + 100 AS k, 2L AS ck, " +
        "3L AS pk, 1500.0D AS v FROM mvbl_fsrc WHERE k <= 3").collect()
      s.sql("UPDATE mvbl_c SET seg = 'seg9' WHERE c_id = 4").collect()
      s.sql("UPDATE mvbl_p SET cat = 'cat9' WHERE p_id = 2").collect()
      s.sql("DELETE FROM mvbl_fact WHERE k % 11 = 0").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvbl").collect()
      mv() shouldBe scratch()
      mv().map(_.getString(0)) should contain("seg9")
      mv().map(_.getString(1)) should contain("cat9")
      // a dim phase whose attribute flip REMOVES a group's max-holders
      // rescans within that phase (the delete side of the dim feed ties
      // the stored extremum)
      graft.sources.LakeMv.lastRescanGroups // (observability only)
      s.sql("UPDATE mvbl_c SET seg = 'seg0' WHERE seg = 'seg9'").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvbl").collect()
      mv() shouldBe scratch()
      // CRASH inside the first dim phase (after its side-table commits,
      // before its main merge), then MORE commits on the fact and BOTH
      // dims before the retry — each chain resumes from where it truly
      // is and the retry converges
      s.sql("UPDATE mvbl_c SET seg = 'seg1' WHERE c_id = 5").collect()
      graft.sources.LakeMv.failBeforeMainMerge = true
      try {
        intercept[RuntimeException] {
          s.sql("REFRESH MATERIALIZED VIEW mvbl").collect()
        }.getMessage should include("injected crash")
      } finally graft.sources.LakeMv.failBeforeMainMerge = false
      s.sql("UPDATE mvbl_c SET seg = 'seg2' WHERE c_id = 1").collect()
      s.sql("UPDATE mvbl_p SET cat = 'cat0' WHERE p_id = 2").collect()
      s.sql("DELETE FROM mvbl_fact WHERE k = 5").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvbl").collect()
      mv() shouldBe scratch()
      // chains in lockstep again: the next mixed interval folds clean
      s.sql("UPDATE mvbl_c SET seg = 'seg3' WHERE c_id = 2").collect()
      s.sql("DELETE FROM mvbl_fact WHERE k = 7").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvbl").collect()
      mv() shouldBe scratch()
    }
  }

  test("materialized views over a STAR-JOIN VIEW: body compiles to dims, both fold directions, refusals") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 60L).map(k => (k, 1L + k % 5, k * 10.0))
        .toDF("k", "ck", "v").createOrReplaceTempView("mvsj_fsrc")
      (1L to 5L).map(c => (c, s"seg${c % 2}", c * 100))
        .toDF("c_id", "seg", "quota").createOrReplaceTempView("mvsj_csrc")
      s.sql("CREATE TABLE mvsj_fact KEY k AS SELECT * FROM mvsj_fsrc")
        .collect()
      s.sql("CREATE TABLE mvsj_c KEY c_id AS SELECT * FROM mvsj_csrc")
        .collect()
      // the view IS the star: computed column + WHERE + INNER spelling
      s.sql(
        """CREATE VIEW mvsj_sales AS
          |SELECT seg, k, ck, v * 2 AS net
          |FROM mvsj_fact INNER JOIN mvsj_c ON ck = c_id
          |WHERE v < 550.0""".stripMargin).collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvsj AS
          |SELECT seg, count(*) AS n, sum(net) AS sn, max(net) AS hi
          |FROM mvsj_sales GROUP BY seg""".stripMargin).collect()
      def mv() = s.sql(
        "SELECT seg, n, CAST(sn AS DECIMAL(28,10)) AS sn, hi FROM mvsj " +
          "ORDER BY seg").collect().toSeq
      def scratch() = s.sql(
        """SELECT seg, count(*) AS n,
          |CAST(sum(CAST(net AS DECIMAL(28,10))) AS DECIMAL(28,10)) AS sn,
          |max(net) AS hi
          |FROM mvsj_sales GROUP BY seg ORDER BY seg""".stripMargin)
        .collect().toSeq
      mv() shouldBe scratch()
      // FACT phase: insert new groups through the dim, cross the view's
      // WHERE boundary both ways, delete the stored maxima (rescan runs
      // through the view's post-join projection)
      s.sql("INSERT INTO mvsj_fact SELECT k + 100 AS k, 3L AS ck, " +
        "500.0D AS v FROM mvsj_fsrc WHERE k <= 4").collect()
      s.sql("UPDATE mvsj_fact SET v = CASE WHEN v < 100.0 THEN v + 500.0 " +
        "ELSE v - 100.0 END WHERE k % 7 = 3").collect()
      s.sql("DELETE FROM mvsj_fact WHERE v >= 520.0").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvsj").collect()
      mv() shouldBe scratch()
      // DIM phase: a segment flip folds THROUGH the view's post stage
      s.sql("UPDATE mvsj_c SET seg = 'seg9' WHERE c_id = 2").collect()
      s.sql("SELECT n_dims, n_dims_stale FROM graft_mv_detail('mvsj')")
        .collect()(0).toSeq shouldBe Seq(1, 1)
      s.sql("REFRESH MATERIALIZED VIEW mvsj").collect()
      mv() shouldBe scratch()
      mv().map(_.getString(0)) should contain("seg9")
      // REDEFINITION refuses the incremental fold; FULL re-reads + re-pins
      s.sql(
        """CREATE OR REPLACE VIEW mvsj_sales AS
          |SELECT seg, k, ck, v * 3 AS net
          |FROM mvsj_fact INNER JOIN mvsj_c ON ck = c_id
          |WHERE v < 550.0""".stripMargin).collect()
      s.sql("DELETE FROM mvsj_fact WHERE k = 9").collect()
      intercept[IllegalStateException] {
        s.sql("REFRESH MATERIALIZED VIEW mvsj").collect()
      }.getMessage should include("REDEFINED")
      s.sql("REFRESH MATERIALIZED VIEW mvsj FULL").collect()
      mv() shouldBe scratch() // new body (v*3), re-compiled dims
      // and the fold keeps working after the re-pin, both directions
      s.sql("UPDATE mvsj_c SET seg = 'seg0' WHERE c_id = 4").collect()
      s.sql("DELETE FROM mvsj_fact WHERE k = 11").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvsj").collect()
      mv() shouldBe scratch()
      // refusal surface: outer joins refuse EXPLICITLY — in the MV
      // grammar itself, and through a view body
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW mvsj_bad AS SELECT seg, " +
          "count(*) AS n FROM mvsj_fact LEFT JOIN mvsj_c ON ck = c_id " +
          "GROUP BY seg").collect()
      }.getMessage should include("only inner")
      s.sql(
        """CREATE VIEW mvsj_outer AS
          |SELECT seg, v FROM mvsj_fact LEFT JOIN mvsj_c ON ck = c_id
          |""".stripMargin).collect()
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW mvsj_bad2 AS SELECT seg, " +
          "count(*) AS n FROM mvsj_outer GROUP BY seg").collect()
      }.getMessage should include("outer joins")
      // a star view + MV-level JOIN clauses cannot compose
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW mvsj_bad3 AS SELECT seg, " +
          "count(*) AS n FROM mvsj_sales JOIN mvsj_c ON ck = c_id " +
          "GROUP BY seg").collect()
      }.getMessage should include("already provides a star join")
      // the OUTER spellings refuse with the same explicit message
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW mvsj_bad4 AS SELECT seg, " +
          "count(*) AS n FROM mvsj_fact LEFT OUTER JOIN mvsj_c " +
          "ON ck = c_id GROUP BY seg").collect()
      }.getMessage should include("only inner")
      // left()/right() inside a star view's WHERE are string functions,
      // not join forms — the body still compiles onto the star machinery
      s.sql(
        """CREATE VIEW mvsj_lr AS
          |SELECT seg, k, ck, v FROM mvsj_fact JOIN mvsj_c ON ck = c_id
          |WHERE left(seg, 3) = 'seg'""".stripMargin).collect()
      s.sql("CREATE MATERIALIZED VIEW mvsj_lrm AS SELECT seg, " +
        "count(*) AS n FROM mvsj_lr GROUP BY seg").collect()
      s.sql("SELECT sum(n) FROM mvsj_lrm").collect()(0).getLong(0) should
        be > 0L
    }
  }

  test("CASCADING materialized views: an MV over an MV folds the upstream's state feed") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 80L).map(k => (k, s"p${k % 4}", 1L + k % 10, k * 10.0))
        .toDF("k", "prio", "ck", "v").createOrReplaceTempView("mvcc_src")
      s.sql("CREATE TABLE mvcc_base KEY k AS SELECT * FROM mvcc_src")
        .collect()
      // LEVEL 1: per (prio, ck) — sum/avg/count, with a HAVING the
      // downstream must see as a row filter
      s.sql(
        """CREATE MATERIALIZED VIEW mvcc_1 AS
          |SELECT prio, ck, count(*) AS n1, sum(v) AS rev, avg(v) AS av
          |FROM mvcc_base GROUP BY prio, ck
          |HAVING n1 >= 2""".stripMargin).collect()
      // LEVEL 2: per prio over LEVEL 1's SERVED relation
      s.sql( // count(DISTINCT n1): n1 repeats across level-1 groups, so
        // the side table carries REAL multiplicities and value deaths
        """CREATE MATERIALIZED VIEW mvcc_2 AS
          |SELECT prio, count(*) AS n_groups, count(DISTINCT n1) AS ns,
          |       sum(rev) AS total, max(rev) AS hi, avg(av) AS aav
          |FROM mvcc_1 GROUP BY prio""".stripMargin).collect()
      def mv2() = s.sql(
        "SELECT prio, n_groups, ns, " +
          "CAST(total AS DECIMAL(28,10)) AS total, " +
          "hi, CAST(round(aav, 6) AS DOUBLE) AS aav FROM mvcc_2 " +
          "ORDER BY prio").collect().toSeq
      def scratch() = s.sql(
        """WITH m1 AS (
          |  SELECT prio, ck, count(*) AS n1,
          |         sum(CAST(v AS DECIMAL(28,10))) AS rev,
          |         CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE)
          |           / count(v) AS av
          |  FROM mvcc_base GROUP BY prio, ck HAVING count(*) >= 2)
          |SELECT prio, count(*) AS n_groups, count(DISTINCT n1) AS ns,
          |  CAST(sum(CAST(rev AS DECIMAL(28,10))) AS DECIMAL(28,10))
          |    AS total,
          |  max(rev) AS hi,
          |  CAST(round(CAST(sum(CAST(av AS DECIMAL(28,10))) AS DOUBLE)
          |    / count(av), 6) AS DOUBLE) AS aav
          |FROM m1 GROUP BY prio ORDER BY prio""".stripMargin)
        .collect().toSeq
      mv2() shouldBe scratch()
      // base DML → refresh UPSTREAM then DOWNSTREAM: the level-2 fold
      // consumes level-1's state commits (groups move across the HAVING
      // boundary, extrema die → the rescan runs over the projected feed)
      s.sql("INSERT INTO mvcc_base SELECT k + 100 AS k, 'p9' AS prio, " +
        "3L AS ck, 500.0D AS v FROM mvcc_src WHERE k <= 3").collect()
      s.sql("DELETE FROM mvcc_base WHERE v >= 700.0").collect()
      s.sql("UPDATE mvcc_base SET v = v + 5.0 WHERE k % 7 = 1").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcc_1").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcc_2").collect()
      mv2() shouldBe scratch()
      // refreshing the DOWNSTREAM alone is a no-op while the upstream
      // stands still — the staleness contract composes level by level
      s.sql("DELETE FROM mvcc_base WHERE k = 50").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcc_2").collect()
      val beforeUp = mv2()
      s.sql("REFRESH MATERIALIZED VIEW mvcc_1").collect()
      mv2() shouldBe beforeUp // still the old level-1 content
      s.sql("REFRESH MATERIALIZED VIEW mvcc_2").collect()
      mv2() shouldBe scratch()
      // detail surfaces the composed staleness alert on a rebuilt
      // upstream, and the fold refuses until FULL re-pins
      s.sql("REFRESH MATERIALIZED VIEW mvcc_1 FULL").collect()
      s.sql("SELECT view_pin_stale FROM graft_mv_detail('mvcc_2')")
        .collect()(0).getBoolean(0) shouldBe true
      s.sql("DELETE FROM mvcc_base WHERE k = 51").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcc_1").collect()
      intercept[IllegalStateException] {
        s.sql("REFRESH MATERIALIZED VIEW mvcc_2").collect()
      }.getMessage should include("REDEFINED or REBUILT")
      s.sql("REFRESH MATERIALIZED VIEW mvcc_2 FULL").collect()
      mv2() shouldBe scratch()
      // and the re-pinned chain keeps folding incrementally
      s.sql("DELETE FROM mvcc_base WHERE k = 52").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcc_1").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcc_2").collect()
      mv2() shouldBe scratch()
      // a RENAAMED upstream severs the name link: refuse with guidance
      s.sql("ALTER MATERIALIZED VIEW mvcc_1 RENAME TO mvcc_1b").collect()
      s.sql("DELETE FROM mvcc_base WHERE k = 53").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcc_1b").collect()
      intercept[IllegalStateException] {
        s.sql("REFRESH MATERIALIZED VIEW mvcc_2").collect()
      }.getMessage should include("no longer bound")
      // rename BACK: the pin is rename-proof (normalized compare strips
      // the statement text and app id), so the fold resumes untouched
      s.sql("ALTER MATERIALIZED VIEW mvcc_1b RENAME TO mvcc_1").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcc_2").collect()
      mv2() shouldBe scratch()
      // OPTIMIZE of the upstream compacts its state — a rewrite-only
      // commit whose content diff is EMPTY: the downstream folds it as
      // a clean no-op, never a phantom delta
      s.sql("OPTIMIZE MATERIALIZED VIEW mvcc_1 FILES 2").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcc_2").collect()
      mv2() shouldBe scratch()
    }
  }

  test("CASCADING MV with its own JOIN dims: the rollup joins a dimension over the projected feed") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 60L).map(k => (k, 1L + k % 6, k * 10.0))
        .toDF("k", "ck", "v").createOrReplaceTempView("mvcd_src")
      (1L to 6L).map(c => (c, s"tier${c % 2}"))
        .toDF("c_id", "tier").createOrReplaceTempView("mvcd_dsrc")
      s.sql("CREATE TABLE mvcd_base KEY k AS SELECT * FROM mvcd_src")
        .collect()
      s.sql("CREATE TABLE mvcd_dim KEY c_id AS SELECT * FROM mvcd_dsrc")
        .collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvcd_1 AS
          |SELECT ck, count(*) AS n1, sum(v) AS rev, max(v) AS hi1
          |FROM mvcd_base GROUP BY ck""".stripMargin).collect()
      // the downstream JOINS a dim onto the upstream's served relation:
      // the dim phase folds over the PROJECTED state feed, and the
      // rescan's dim-lead pushdown machinery sees the cascade pre stage
      s.sql(
        """CREATE MATERIALIZED VIEW mvcd_2 AS
          |SELECT tier, count(*) AS ng, sum(rev) AS total,
          |       max(hi1) AS hi
          |FROM mvcd_1 JOIN mvcd_dim ON ck = c_id
          |GROUP BY tier""".stripMargin).collect()
      def mv2() = s.sql(
        "SELECT tier, ng, CAST(total AS DECIMAL(28,10)) AS total, hi " +
          "FROM mvcd_2 ORDER BY tier").collect().toSeq
      def scratch() = s.sql(
        """WITH m1 AS (
          |  SELECT ck, sum(CAST(v AS DECIMAL(28,10))) AS rev,
          |         max(v) AS hi1
          |  FROM mvcd_base GROUP BY ck)
          |SELECT tier, count(*) AS ng,
          |  CAST(sum(CAST(rev AS DECIMAL(28,10))) AS DECIMAL(28,10))
          |    AS total, max(hi1) AS hi
          |FROM m1 JOIN mvcd_dim ON ck = c_id
          |GROUP BY tier ORDER BY tier""".stripMargin).collect().toSeq
      mv2() shouldBe scratch()
      // base DML folds up the chain; a DIM flip (group move) and an
      // extremum death each fold as their own phases downstream
      s.sql("DELETE FROM mvcd_base WHERE v >= 550.0").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcd_1").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcd_2").collect()
      mv2() shouldBe scratch()
      s.sql("UPDATE mvcd_dim SET tier = 'tierX' WHERE c_id = 2").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcd_2").collect()
      mv2() shouldBe scratch()
      mv2().map(_.getString(0)) should contain("tierX")
    }
  }

  test("CASCADING over a STAR upstream: the chain composes with join MVs") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 60L).map(k => (k, 1L + k % 5, k * 10.0))
        .toDF("k", "ck", "v").createOrReplaceTempView("mvcs_fsrc")
      (1L to 5L).map(c => (c, s"seg${c % 2}", s"r${c % 3}"))
        .toDF("c_id", "seg", "region").createOrReplaceTempView("mvcs_csrc")
      s.sql("CREATE TABLE mvcs_fact KEY k AS SELECT * FROM mvcs_fsrc")
        .collect()
      s.sql("CREATE TABLE mvcs_c KEY c_id AS SELECT * FROM mvcs_csrc")
        .collect()
      // level 1 IS a star join; level 2 rolls its groups up further
      s.sql(
        """CREATE MATERIALIZED VIEW mvcs_1 AS
          |SELECT region, seg, count(*) AS n1, sum(v) AS rev
          |FROM mvcs_fact JOIN mvcs_c ON ck = c_id
          |GROUP BY region, seg""".stripMargin).collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvcs_2 AS
          |SELECT region, count(*) AS nseg, sum(rev) AS total
          |FROM mvcs_1 GROUP BY region""".stripMargin).collect()
      def mv2() = s.sql(
        "SELECT region, nseg, CAST(total AS DECIMAL(28,10)) AS total " +
          "FROM mvcs_2 ORDER BY region").collect().toSeq
      def scratch() = s.sql(
        """WITH m1 AS (
          |  SELECT region, seg, sum(CAST(v AS DECIMAL(28,10))) AS rev
          |  FROM mvcs_fact JOIN mvcs_c ON ck = c_id GROUP BY 1, 2)
          |SELECT region, count(*) AS nseg,
          |  CAST(sum(CAST(rev AS DECIMAL(28,10))) AS DECIMAL(28,10))
          |    AS total
          |FROM m1 GROUP BY 1 ORDER BY 1""".stripMargin).collect().toSeq
      mv2() shouldBe scratch()
      // BOTH bilinear directions upstream propagate down the chain:
      // a fact write and a DIM flip (which moves level-1 groups across
      // (region, seg) pairs) each fold level 1 then level 2
      s.sql("DELETE FROM mvcs_fact WHERE k % 9 = 0").collect()
      s.sql("UPDATE mvcs_c SET seg = 'segX', region = 'rX' " +
        "WHERE c_id = 3").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcs_1").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvcs_2").collect()
      mv2() shouldBe scratch()
      mv2().map(_.getString(0)) should contain("rX")
    }
  }

  test("star-join MV refresh PRUNES the fact scan: join-key isin pushdown on a key-clustered fact") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      // 120 fact rows, join key ck monotone in the table key (12 rows per
      // ck) — after OPTIMIZE … SORT BY (ck) each of the 10 files holds
      // exactly one ck value with tight manifest stats
      (1L to 120L).map(k => (k, (k - 1) / 12 + 1, k * 10.0))
        .toDF("k", "ck", "v").createOrReplaceTempView("mvpr_fsrc")
      (1L to 10L).map(c => (c, s"seg${c % 3}"))
        .toDF("c_id", "seg").createOrReplaceTempView("mvpr_csrc")
      s.sql("CREATE TABLE mvpr_fact KEY k STATS (ck) AS " +
        "SELECT * FROM mvpr_fsrc").collect()
      s.sql("CREATE TABLE mvpr_c KEY c_id AS SELECT * FROM mvpr_csrc")
        .collect()
      s.sql("OPTIMIZE mvpr_fact FILES 10 SORT BY (ck)").collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvpr AS
          |SELECT seg, count(*) AS n, sum(v) AS sv, max(v) AS hi
          |FROM mvpr_fact JOIN mvpr_c ON ck = c_id
          |GROUP BY seg""".stripMargin).collect()
      def mv() = s.sql(
        "SELECT seg, n, CAST(sv AS DECIMAL(28,10)) AS sv, hi FROM mvpr " +
          "ORDER BY seg").collect().toSeq
      def scratch() = s.sql(
        """SELECT seg, count(*) AS n,
          |CAST(sum(CAST(v AS DECIMAL(28,10))) AS DECIMAL(28,10)) AS sv,
          |max(v) AS hi
          |FROM mvpr_fact JOIN mvpr_c ON ck = c_id
          |GROUP BY seg ORDER BY seg""".stripMargin).collect().toSeq
      mv() shouldBe scratch()
      def scanFiles(q: String): Long = s.sql(q)
        .queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.flatMap(_.relation.location.inputFiles).length.toLong
      val total = scanFiles("SELECT * FROM mvpr_fact")
      total shouldBe 10L
      graft.sources.LakeMv.captureFactScan = true
      try {
        // dim-only commit, NO extremum tied: the dim phase's fact scan
        // carries isin(ck ∈ {3}) — the manifest prune rule drops every
        // file whose ck range misses it (strictly fewer than a full pass)
        s.sql("UPDATE mvpr_c SET seg = 'segX' WHERE c_id = 3").collect()
        s.sql("REFRESH MATERIALIZED VIEW mvpr").collect()
        graft.sources.LakeMv.lastRescanGroups shouldBe 0L
        graft.sources.LakeMv.lastPrefilterKeys shouldBe 1L
        graft.sources.LakeMv.lastFactScanFiles should be >= 1L
        graft.sources.LakeMv.lastFactScanFiles should be < total
        mv() shouldBe scratch()
        // dim flip that REMOVES seg1's max holder (c_id=10 carries the
        // highest-v fact rows): the min/max rescan fires for seg1, and
        // the DIM-LEAD pushdown resolves seg1 → dim keys {1,4,7} → an
        // isin on the FACT's ck — the rescan's fact scan prunes too
        s.sql("UPDATE mvpr_c SET seg = 'seg9' WHERE c_id = 10").collect()
        s.sql("REFRESH MATERIALIZED VIEW mvpr").collect()
        graft.sources.LakeMv.lastRescanGroups shouldBe 1L
        graft.sources.LakeMv.lastFactScanFiles should be >= 1L
        graft.sources.LakeMv.lastFactScanFiles should be < total
        mv() shouldBe scratch()
      } finally graft.sources.LakeMv.captureFactScan = false
    }
  }

  test("materialized views over a STAR JOIN: fact-feed fold, dim pinning, FULL re-pin") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 60L).map(k => (k, 1L + k % 5, k * 10.0))
        .toDF("ok", "ck", "price").createOrReplaceTempView("mvj_osrc")
      (1L to 5L).map(c => (c, s"seg${c % 2}"))
        .toDF("c_id", "seg").createOrReplaceTempView("mvj_csrc")
      s.sql("CREATE TABLE mvjt_fact KEY ok AS SELECT * FROM mvj_osrc")
        .collect()
      s.sql("CREATE TABLE mvjt_dim KEY c_id AS SELECT * FROM mvj_csrc")
        .collect()
      s.sql(
        """CREATE MATERIALIZED VIEW mvjt AS
          |SELECT seg, count(*) AS n, sum(price) AS rev, max(price) AS hi,
          |       count(DISTINCT ck) AS nc
          |FROM mvjt_fact JOIN mvjt_dim ON ck = c_id
          |GROUP BY seg""".stripMargin).collect()
      def mv() = s.sql(
        "SELECT seg, n, CAST(rev AS DECIMAL(28,10)) AS rev, hi, nc " +
          "FROM mvjt ORDER BY seg").collect().toSeq
      def scratch() = s.sql(
        """SELECT seg, count(*) AS n,
          |CAST(sum(CAST(price AS DECIMAL(28,10))) AS DECIMAL(28,10)) AS rev,
          |max(price) AS hi, count(DISTINCT ck) AS nc
          |FROM mvjt_fact JOIN mvjt_dim ON ck = c_id
          |GROUP BY seg ORDER BY seg""".stripMargin).collect().toSeq
      mv() shouldBe scratch()
      // fact-side DML: insert (new groups via the dim lookup), customer
      // MOVE (the group change is visible only THROUGH the join), and an
      // extremum-tying delete (rescan over the joined shape)
      s.sql("INSERT INTO mvjt_fact SELECT ok + 100 AS ok, 3L AS ck, " +
        "2000.0D AS price FROM mvj_osrc WHERE ok <= 4").collect()
      s.sql("UPDATE mvjt_fact SET ck = 1 + (ck % 5) WHERE ok % 10 = 7")
        .collect()
      s.sql("DELETE FROM mvjt_fact WHERE price >= 590.0").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvjt").collect()
      graft.sources.LakeMv.lastRescanGroups should be > 0L
      mv() shouldBe scratch()
      val r2 = s.sql("REFRESH MATERIALIZED VIEW mvjt").collect()(0)
      r2.getInt(1) shouldBe r2.getInt(2) // already fresh: no-op
      // detail surfaces the star shape: 1 dim, no pending deltas
      s.sql("SELECT n_dims, n_dims_stale FROM graft_mv_detail('mvjt')")
        .collect()(0).toSeq shouldBe Seq(1, 0)
      // a DIM write folds INCREMENTALLY as its own bilinear phase — the
      // attribute flip moves every joined fact row between groups, and
      // the fold sees exactly that multiset diff
      s.sql("UPDATE mvjt_dim SET seg = 'seg9' WHERE c_id = 3").collect()
      s.sql("SELECT n_dims_stale FROM graft_mv_detail('mvjt')")
        .collect()(0).getInt(0) shouldBe 1
      s.sql("DELETE FROM mvjt_fact WHERE ok = 2").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvjt").collect()
      mv() shouldBe scratch()
      mv().map(_.getString(0)) should contain("seg9")
      s.sql("SELECT n_dims_stale FROM graft_mv_detail('mvjt')")
        .collect()(0).getInt(0) shouldBe 0
      // a dim-ONLY change folds too: fact span is a no-op but groups
      // still move (the old silent-no-op hazard, now a real fold)
      s.sql("UPDATE mvjt_dim SET seg = 'seg8' WHERE c_id = 1").collect()
      val r3 = s.sql("REFRESH MATERIALIZED VIEW mvjt").collect()(0)
      r3.getInt(1) shouldBe r3.getInt(2) // fact did not advance
      r3.getLong(3) should be > 0L // but the dim phase touched groups
      mv() shouldBe scratch()
      // RESTORE of a dim is just another commit: the next refresh folds
      // the rollback's diff like any other interval
      s.sql("RESTORE TABLE mvjt_dim TO VERSION AS OF 0").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvjt").collect()
      mv() shouldBe scratch()
      // FULL still rebuilds+re-pins, and incrementals resume after it
      s.sql("REFRESH MATERIALIZED VIEW mvjt FULL").collect()
      mv() shouldBe scratch()
      s.sql("DELETE FROM mvjt_fact WHERE ok = 4").collect()
      s.sql("UPDATE mvjt_dim SET seg = 'seg7' WHERE c_id = 5").collect()
      s.sql("REFRESH MATERIALIZED VIEW mvjt").collect()
      mv() shouldBe scratch()
      // SHOW CREATE round-trips the join grammar
      val stmt = s.sql("SHOW CREATE TABLE mvjt").collect()(0).getString(1)
      stmt should include("JOIN mvjt_dim ON ck = c_id")
      // namespaced relations qualify by their LAST name part
      s.sql("CREATE TABLE dims.cust2 KEY c_id AS SELECT * FROM mvj_csrc")
        .collect()
      s.sql("CREATE MATERIALIZED VIEW mvjt_ns AS SELECT seg, count(*) AS n " +
        "FROM mvjt_fact JOIN dims.cust2 ON mvjt_fact.ck = cust2.c_id " +
        "GROUP BY seg").collect()
      s.sql("SELECT sum(n) FROM mvjt_ns").collect()(0).getLong(0) should be > 0L
      // refusals: a dim that is not a lake table; duplicate rel names
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW mvjt2 AS SELECT seg, count(*) AS n " +
          "FROM mvjt_fact JOIN nowhere ON ck = c_id GROUP BY seg").collect()
      }.getMessage should include("JOIN dimension")
      intercept[Exception] {
        s.sql("CREATE MATERIALIZED VIEW mvjt2 AS SELECT ck, count(*) AS n " +
          "FROM mvjt_fact JOIN mvjt_fact ON ck = c_id GROUP BY ck").collect()
      }.getMessage should include("pairwise-distinct")
    }
  }

  test("materialized views × type widening: refuse the narrowing fold; REFRESH FULL rebuilds in the new type") {
    withExtendedSession { s =>
      import s.implicits._
      s.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
      (1L to 24L).map(k => (k, s"g${k % 3}", (k * 10).toInt))
        .toDF("k", "grp", "v").createOrReplaceTempView("mvw_src")
      s.sql("CREATE TABLE mvw_base KEY k AS " +
        "SELECT k, grp, CAST(v AS INT) AS v FROM mvw_src").collect()
      val root = graft.sources.LakeCatalog.lookup(s, "mvw_base").get
      s.sql(
        """CREATE MATERIALIZED VIEW mvw AS
          |SELECT grp, count(*) AS n, max(v) AS hi
          |FROM mvw_base GROUP BY grp""".stripMargin).collect()
      def mv() = s.sql("SELECT grp, n, hi FROM mvw ORDER BY grp")
        .collect().toSeq
      def scratch() = s.sql(
        """SELECT grp, count(*) AS n, max(v) AS hi FROM mvw_base
          |GROUP BY grp ORDER BY grp""".stripMargin).collect().toSeq
      // widen the max() argument INT → BIGINT: the state stores the
      // CREATE-time INT extremum, so an incremental fold would narrow
      // new values through a lossy cast — refuse, naming the repair that
      // genuinely works here (FULL rebuilds the state in the new type)
      s.sql(s"ALTER TABLE graft_lake('$root') ALTER COLUMN v TYPE BIGINT")
        .collect()
      s.sql("INSERT INTO mvw_base SELECT 100L AS k, 'g0' AS grp, " +
        "CAST(5000000000 AS BIGINT) AS v").collect() // > Int.MaxValue
      val e = intercept[Exception] {
        s.sql("REFRESH MATERIALIZED VIEW mvw").collect()
      }.getMessage
      e should include("type changed")
      e should include("REFRESH MATERIALIZED VIEW mvw FULL")
      s.sql("REFRESH MATERIALIZED VIEW mvw FULL").collect()
      mv() shouldBe scratch()
      mv().find(_.getString(0) == "g0").get.getLong(2) shouldBe 5000000000L
      // incremental refresh resumes in the new type — including the
      // extremum-tying-delete rescan path
      s.sql("DELETE FROM mvw_base WHERE k = 100").collect() // ties g0's max
      s.sql("REFRESH MATERIALIZED VIEW mvw").collect()
      graft.sources.LakeMv.lastRescanGroups should be > 0L
      mv() shouldBe scratch()
    }
  }
}
