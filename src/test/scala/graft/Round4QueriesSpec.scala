package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-4 operator families (quantiles,
  * moments, regex extraction, PII redaction, contamination scan, SCD2,
  * k-NN classification, sinks). The oracle hash gate checks exact
  * values; these pin the PROPERTIES that must hold for any input, so a
  * future refactor that silently changes semantics fails here even on
  * data the oracle never sees. */
class Round4QueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_percentile_cont: quantiles are monotone within each group") {
    run("q_percentile_cont").collect().foreach { r =>
      val (p25, p50, p75, p95) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95,
        s"non-monotone quantiles in ${r.getString(0)}: $p25 $p50 $p75 $p95")
    }
  }

  test("q_ntile_deciles: 10 buckets, near-equal sizes, ordered non-overlapping ranges") {
    val rows = run("q_ntile_deciles").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"ntile sizes must differ by <=1: ${sizes.toSeq}")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2),
        s"decile ${a.getLong(0)} hi > decile ${b.getLong(0)} lo")
    }
  }

  test("q_central_moments: price distribution moments are finite and sane") {
    run("q_central_moments").collect().foreach { r =>
      val (skew, kurt) = (r.getDouble(2), r.getDouble(3))
      assert(!skew.isNaN && !kurt.isNaN)
      assert(math.abs(skew) < 10 && kurt > -3, s"implausible moments: $skew $kurt")
    }
  }

  test("q_regexp_extract_all: distinct counts bounded by hit counts, terms sorted") {
    run("q_regexp_extract_all").collect().foreach { r =>
      assert(r.getInt(2) <= r.getInt(1))
      val terms = r.getString(3).split(",").toSeq
      assert(terms == terms.sorted && terms.nonEmpty)
    }
  }

  test("text_pii_redact: the redaction chain leaves no digits or addresses behind") {
    // rebuild the query's redaction kernel on raw fixture rows and check
    // the INVARIANT the md5 in the query output can't express directly
    // the spec calls the query's OWN kernel (TextQueries.piiSalted /
    // piiRedacted) so a pattern edit there can't drift past this test
    val redacted = Tables.documents(spark, sfDir)
      .limit(50)
      .select(col("doc_id"), graft.queries.TextQueries.piiSalted.as("raw"))
      .select(graft.queries.TextQueries.piiRedacted(col("raw")).as("red"))
      .collect().map(_.getString(0))
    redacted.foreach { s =>
      assert(!s.exists(_.isDigit), s"digits survived redaction: $s")
      assert(s.contains("<EMAIL>") && s.contains("<PHONE>") && s.contains("<NUM>"))
    }
    // and the query itself reports exactly one injected email+phone per doc
    run("text_pii_redact").collect().foreach { r =>
      assert(r.getInt(1) == 1 && r.getInt(2) == 1,
        s"doc ${r.getLong(0)}: expected 1 email + 1 phone, got ${r.getInt(1)}/${r.getInt(2)}")
    }
  }

  test("text_contamination: flags only non-eval docs, with positive overlap") {
    val rows = run("text_contamination").collect()
    assert(rows.nonEmpty, "fixture corpus contains near-dups; overlap expected")
    rows.foreach { r =>
      assert(r.getLong(0) % 10 != 0, "eval docs must not be flagged against themselves")
      assert(r.getLong(1) >= 1)
    }
  }

  test("q_scd2_user_state: per-user intervals chain without gaps; one open interval") {
    val rows = run("q_scd2_user_state").collect()
      .groupBy(_.getLong(0)) // user_id
    rows.foreach { case (user, rs) =>
      val sorted = rs.sortBy(_.getLong(2))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(3) && a.getLong(3) == b.getLong(2),
            s"user $user: valid_to of one version must equal valid_from of the next")
        case _ => ()
      }
      assert(rs.count(_.getBoolean(5)) == 1, s"user $user: exactly one current row")
      assert(sorted.last.isNullAt(3), s"user $user: the last version is the open one")
    }
  }

  test("sim_knn_classify: one prediction per held-out vector, votes within [1,5]") {
    val rows = run("sim_knn_classify").collect()
    val nQueries = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 100 === 1).count()
    assert(rows.length.toLong == nQueries)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach(r => assert(r.getLong(2) >= 1 && r.getLong(2) <= 5))
  }

  test("q_mad_outliers: outliers are a small minority; mad <= spread") {
    run("q_mad_outliers").collect().foreach { r =>
      val (n, out) = (r.getLong(1), r.getLong(2))
      assert(out < n / 4, s"${r.getString(0)}: MAD flagged $out of $n — not robust")
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("text_pack_sequences: packs partition the corpus; token counts conserved") {
    val rows = run("text_pack_sequences").collect()
    val totalDocs = rows.map(_.getLong(1)).sum
    val totalTokens = rows.map(_.getLong(2)).sum
    val src = Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n")), count(lit(1))).collect()(0)
    assert(totalTokens == src.getLong(0), "every token lands in exactly one pack")
    assert(totalDocs == src.getLong(1), "every doc lands in exactly one pack")
    // packing is per-shard (pack_id = shard·2⁴⁰ + local pack — the 10⁶
    // namespace collided at 512M tokens/shard, r9 review): within a
    // shard, consecutive packs' doc ranges must not interleave, and a
    // pack's docs must all carry its shard residue (doc_id % 16)
    rows.groupBy(_.getLong(0) >> 40).foreach { case (shard, packs) =>
      packs.foreach { p =>
        assert(p.getLong(3) % 16 == shard && p.getLong(4) % 16 == shard,
          s"pack ${p.getLong(0)} holds docs outside shard $shard")
      }
      packs.sortBy(_.getLong(0)).sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) <= b.getLong(3))
        case _ => ()
      }
    }
  }

  test("q_sample_mixture: achieved rates track targets within binomial noise") {
    val targets = Map("en" -> 0.25, "zh" -> 0.75).withDefaultValue(0.5)
    run("q_sample_mixture").collect().foreach { r =>
      val (lang, n, rate) = (r.getString(0), r.getLong(1), r.getDouble(3))
      val tol = 4 * math.sqrt(0.25 / n) // 4σ of a Bernoulli mean
      assert(math.abs(rate - targets(lang)) < tol,
        s"$lang: achieved $rate vs target ${targets(lang)} (n=$n)")
    }
  }

  test("sink round-trips preserve counts and content") {
    val srcByLang = Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sunk = run("q_sink_partitioned").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sunk == srcByLang)
    // partition pruning must reach the file listing on the read-back path
    val out = graft.queries.SinkQueries.scratch(spark, "graft_sink_partitioned", sfDir)
    val pruned = spark.read.parquet(out).filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      "read-back scan should prune on the lang partition column")
    val csv = run("q_sink_csv_roundtrip").collect()
    assert(csv.map(_.getLong(1)).sum == srcByLang.values.sum)
  }
}
