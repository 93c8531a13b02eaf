package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crafted-table pins for the round-11 gate-blindness fixes: each case
  * here is a defect BOTH engines used to share, so the driver's
  * engine-vs-oracle hash compare was structurally blind to it — the
  * only gate that can hold these is a spec with a hand-computed
  * expectation. Tables are staged as parquet under a temp dir with the
  * fixture schemas, and the REGISTRY query runs against it (not a
  * reimplementation), so these pins survive refactors of the query
  * bodies. */
class GateBlindnessSpec extends SparkSpec {

  private def stageDir(): String =
    java.nio.file.Files.createTempDirectory("graft_gateblind").toString

  private def write(dir: String, name: String, df: DataFrame): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")

  private def docs(rows: Seq[(Long, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, text, lang, source) =>
      (id, text, lang, source, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** events rows as (event_id, epochSec, user_id, event_type, value). */
  private def events(rows: Seq[(Long, Long, Long, String, java.lang.Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, sec, u, ty, v) =>
      (id, sec * 1000000L, u, ty, Option(v).map(_.doubleValue), "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
  }

  test("chi-square sums the COMPLETE r x c table: an unobserved cell " +
      "contributes its full expected count") {
    // counts: (en,a)=10 (en,b)=30 (de,a)=20, (de,b) ABSENT. Margins:
    // en=40 de=20, a=30 b=30, n=60. E = {20,20,10,10}; chi2 =
    // 100/20 + 100/20 + 100/10 + 100/10 = 30 exactly. The old
    // observed-cells-only fold returned 20 in BOTH engines.
    val dir = stageDir()
    val rows =
      (1L to 10L).map(i => (i, s"t$i", "en", "a")) ++
      (11L to 40L).map(i => (i, s"t$i", "en", "b")) ++
      (41L to 60L).map(i => (i, s"t$i", "de", "a"))
    write(dir, "documents", docs(rows))
    val r = SparkEntry.queries("q_chisq_independence")(spark, dir).collect().head
    assert(r.getAs[Double]("chi2") === 30.0,
      "empty (de,b) cell must contribute (0-10)^2/10 = 10")
    assert(r.getAs[Long]("dof") === 1L)
  }

  test("KS separates distributions INSIDE one unit bucket (cent bins) " +
      "and excludes NULL values from the denominators") {
    // clicks all 0.10, purchases all 0.90: disjoint distributions, true
    // KS = 1.0 — integer-unit binning scored this 0.0 in both engines.
    // Two NULL-valued clicks used to inflate n1 while never joining any
    // cumulative sum (ECDF tops out at 5/7) — they must be excluded.
    val dir = stageDir()
    val base = 1700000000L
    val rows =
      (1L to 5L).map(i => (i, base + i, i, "click", java.lang.Double.valueOf(0.10))) ++
      (6L to 10L).map(i => (i, base + i, i, "purchase", java.lang.Double.valueOf(0.90))) ++
      Seq((11L, base + 11L, 11L, "click", null: java.lang.Double),
        (12L, base + 12L, 12L, "click", null: java.lang.Double))
    write(dir, "events", events(rows))
    val r = SparkEntry.queries("q_ks_histogram")(spark, dir).collect().head
    assert(r.getAs[Double]("ks") === 1.0, "cent-resolution ECDFs must fully separate")
    assert(r.getAs[Long]("n1") === 5L, "NULL values must not inflate n1")
    assert(r.getAs[Long]("n2") === 5L)
  }

  test("zero-variance anomaly: a day deviating from a constant trail " +
      "flags is_anomaly = 1 (z stays NULL); a constant day flags 0") {
    // 8 days of exactly 100.00 then a 10000.00 spike: sigma = 0 over
    // the trailing week, z is undefined (infinite), but the FLAG must
    // fire — both engines used to NULL it and the spike vanished.
    val dir = stageDir()
    val day = 86400L
    val base = 1700000000L
    val rows = (0L until 8L).map(i =>
      (i + 1, base + i * day, i + 1, "click", java.lang.Double.valueOf(100.0))) :+
      (9L, base + 8L * day, 9L, "click", java.lang.Double.valueOf(10000.0))
    write(dir, "events", events(rows))
    val got = SparkEntry.queries("q_anomaly_zscore")(spark, dir)
      .select(col("day"), col("z"), col("is_anomaly")).collect()
      .map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    val days = got.keys.toSeq.sorted
    // last day = the spike: flag 1, z NULL
    assert(got(days.last) === ((None, Some(1L))),
      s"spike over constant trail must flag: ${got(days.last)}")
    // a mid-series constant day: sigma = 0, revenue == mu -> flag 0
    assert(got(days.head) === ((None, Some(0L))),
      s"constant day must flag 0: ${got(days.head)}")
  }

  test("PSI with an empty derived reference period emits NULL, not a " +
      "plausible smoothed score") {
    // all purchases on ONE day: split_d = min(dte), ref (dte < split_d)
    // is empty. The Laplace-smoothed fold used to emit a finite
    // alarm-range "PSI vs uniform noise" in both engines.
    val dir = stageDir()
    val base = 1700000000L
    val rows = (1L to 6L).map(i =>
      (i, base + i, i, "purchase", java.lang.Double.valueOf(i * 30.0)))
    write(dir, "events", events(rows))
    val r = SparkEntry.queries("q_psi_drift")(spark, dir).collect().head
    assert(r.getAs[Long]("n_ref") === 0L)
    assert(r.isNullAt(r.fieldIndex("psi")),
      "an empty period is no-data, not drift — psi must be NULL")
  }

  test("text_repetition keeps 2-token docs and emits Gopher CHARACTER " +
      "fractions alongside occurrence fractions") {
    // doc 1 'buy now': ONE bigram, NO trigrams — the old bi⋈tri inner
    // join dropped it in both engines (the short boilerplate the query
    // exists to flag). doc 2 'a b a b a b': hand-computed fractions,
    // incl. the >1 duplicate-char case the paper notes for overlaps.
    val dir = stageDir()
    write(dir, "documents", docs(Seq(
      (1L, "buy now", "en", "web"),
      (2L, "a b a b a b", "en", "web"))))
    val got = SparkEntry.queries("text_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.contains(1L), "2-token doc must not vanish")
    val r1 = got(1L)
    assert(r1.getAs[Double]("top_bigram_frac") === 1.0)
    assert(r1.isNullAt(r1.fieldIndex("dup_trigram_frac")),
      "no trigrams -> NULL occurrence share, not a dropped row")
    assert(r1.getAs[Double]("top_bigram_char_frac") === 1.0) // 7 of 7 chars
    assert(r1.getAs[Double]("dup_trigram_char_frac") === 0.0)
    val r2 = got(2L)
    assert(r2.getAs[Double]("top_bigram_frac") === 0.6) // 'a b' 3 of 5
    assert(r2.getAs[Double]("dup_trigram_frac") === 1.0) // all 4 duplicated
    assert(math.abs(r2.getAs[Double]("top_bigram_char_frac") - 9.0 / 11) < 1e-12)
    assert(math.abs(r2.getAs[Double]("dup_trigram_char_frac") - 20.0 / 11) < 1e-12,
      "overlapping duplicate trigrams may exceed 1, as Rae et al. note")
  }

  test("weekly Pearson r survives large near-constant revenues (exact " +
      "integer power sums)") {
    // 7 days in one week, cents ~1e12 with tiny +/-1-cent structure:
    // x (clicks) and y (purchases) move in EXACT opposition, so r = -1.
    // The all-double power-sum form loses the signal entirely at this
    // magnitude (sx^2 ~ 5e25 >> 2^53); the decimal/HUGEINT path keeps
    // the subtraction exact and only then divides.
    val dir = stageDir()
    val day = 86400L
    // 2023-11-13 (Mon) 00:00 UTC — a clean ISO week start
    val base = 1699833600L
    val big = 1e10 // dollars; cents = 1e12
    val rows = (0 until 7).flatMap { i =>
      val d = (i % 3) - 1 // -1, 0, +1 cents around the huge constant
      Seq(
        (i * 2 + 1L, base + i * day, 1L, "click",
          java.lang.Double.valueOf(big + d * 0.01)),
        (i * 2 + 2L, base + i * day, 2L, "purchase",
          java.lang.Double.valueOf(big - d * 0.01)))
    }
    write(dir, "events", events(rows))
    val got = SparkEntry.queries("q_weekly_corr")(spark, dir)
      .select("r").collect().map(r => Option(r.get(0)))
    assert(got.length === 1 && got.head === Some(-1.0),
      s"exact-integer Pearson must recover r = -1, got $got")
  }

  test("session windows merge at EXACTLY the 30-minute gap (inclusive " +
      "boundary, matching the oracle's <= rewrite)") {
    // Spark's UpdatingSessionsIterator starts a new session only when
    // the incoming event's start is STRICTLY past the current session
    // end (the getSessionEnd compare in the shipped 4.1.2 bytecode
    // branches on ifgt) — an event at exactly prev_ts + gap EXTENDS the
    // session, the same inclusive boundary the oracle's
    // `ts - lag(ts) <= INTERVAL 30 MINUTE` rewrite encodes. The
    // fixture's microsecond-jitter timestamps never land on the
    // boundary, so the driver gate is structurally blind to a
    // divergence here; only this pin holds the agreement.
    val dir = stageDir()
    val t0 = 800000000L
    write(dir, "events", events(Seq(
      (1L, t0, 7L, "view", java.lang.Double.valueOf(1.0)),
      // exactly gap later: must merge
      (2L, t0 + 1800L, 7L, "view", java.lang.Double.valueOf(2.0)),
      // gap + 1s after the merged event: must start a new session
      (3L, t0 + 1800L + 1801L, 7L, "view", java.lang.Double.valueOf(4.0)))))
    val out = SparkEntry.queries("q_window_session")(spark, dir).collect()
    assert(out.length === 2,
      s"expected [merged 2-event session, single]: ${out.mkString("; ")}")
    assert(out(0).getAs[Long]("session_start") === t0)
    assert(out(0).getAs[Long]("session_end") === t0 + 1800L + 1800L,
      "merged session must end at last event + gap")
    assert(out(0).getAs[Long]("n") === 2L)
    assert(out(1).getAs[Long]("session_start") === t0 + 3601L)
    assert(out(1).getAs[Long]("n") === 1L)
  }

  test("centered covariance survives a large common mean") {
    // embeddings ~ 1e5 +/- 0.5 on dims 1-2 (perfectly anti-correlated),
    // zeros elsewhere: true cov(1,2) = -0.25. Uncentered E[xy]-E[x]E[y]
    // at this magnitude computes 1e10 - 1e10 and keeps ~1 digit.
    import spark.implicits._
    val dir = stageDir()
    val m = 1e5f
    val emb = (1L to 40L).map { i =>
      val d = if (i % 2 == 0) 0.5f else -0.5f
      (i, Array(m + d, m - d) ++ Array.fill(6)(0.0f), 0)
    }.toDF("vec_id", "embedding", "label")
    write(dir, "embeddings", emb)
    val cov = SparkEntry.queries("q_cov_matrix")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(cov((1L, 2L)) - -0.25) <= 1e-5,
      s"cov(1,2) must be -0.25, got ${cov((1L, 2L))}")
    assert(math.abs(cov((1L, 1L)) - 0.25) <= 1e-5)
  }
}
