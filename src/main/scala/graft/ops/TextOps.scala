package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline surface
  * (north-star ops; no counterpart in the reference, which processes
  * images — appV2.py handles text only as tag names R13/R14).
  *
  * Cross-engine determinism rule: every hash in the dedup/fingerprint
  * family derives from md5 (bit-identical in Spark and DuckDB), never from
  * engine hash() builtins (murmur3 vs duckdb-hash would break the oracle).
  * A 15-hex-digit prefix of the md5 is parsed as a 60-bit integer — fits a
  * signed BIGINT in both engines. */
object TextOps {

  /** Tokenize on single spaces (the documents fixture is space-separated
    * words, FIXTURES.md). */
  def words(text: Column): Column = split(text, " ")

  /** 60-bit integer from a string via md5 — the engine-portable hash.
    * Spark: conv(hex,16,10) → decimal string → long.
    * DuckDB dual: ('0x' || substr(md5(x),1,15))::BIGINT. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash family member j (for MinHash). */
  def md5LongSeeded(c: Column, seed: Int): Column =
    md5Long(concat(lit(s"$seed:"), c))

  /** Distinct word n-gram shingles, exploded to (id, shingle) rows.
    * Documents shorter than n words contribute no shingles (mirrors the
    * DuckDB generate_series dual, which emits an empty series). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val w = words(col(textCol))
    df.select(col(idCol),
        when(size(w) >= n,
          transform(sequence(lit(0), size(w) - n),
            i => concat_ws(" ", (1 to n).map(k => element_at(w, i + k)): _*)))
          .otherwise(array().cast("array<string>")).as("shingle_arr"))
      .select(col(idCol), explode(col("shingle_arr")).as("shingle"))
      .distinct()
  }

  /** Exact Jaccard similarity for every pair sharing ≥1 shingle.
    * The shingle equi-join only materializes CO-OCCURRING pairs — at scale
    * this is the standard inverted-index trick: cost is Σ_shingle df², not
    * n². Very frequent shingles can be stopworded upstream if needed. */
  def jaccardPairs(sh: DataFrame, idCol: String): DataFrame = {
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("sz"))
    val a = sh.select(col(idCol).as("id1"), col("shingle"))
    val b = sh.select(col(idCol).as("id2"), col("shingle"))
    val inter = a.join(b, "shingle")
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id1"), col("sz").as("sz1")), "id1")
      .join(sizes.select(col(idCol).as("id2"), col("sz").as("sz2")), "id2")
      .withColumn("jaccard",
        round(col("inter") / (col("sz1") + col("sz2") - col("inter")), 6))
  }

  /** MinHash signatures: k independent md5-seeded min-hashes over the
    * shingle set. Returns (id, h0..h{k-1}). One shuffle (groupBy id);
    * signatures are k×8 bytes per doc — tiny at any scale. */
  def minhashSignatures(sh: DataFrame, idCol: String, k: Int = 16): DataFrame =
    sh.groupBy(idCol)
      .agg(min(md5LongSeeded(col("shingle"), 0)).as("h0"),
        (1 until k).map(j => min(md5LongSeeded(col("shingle"), j)).as(s"h$j")): _*)

  /** LSH banding over a minhash signature: k hashes → `bands` bands of
    * k/bands rows each; docs agreeing on ANY band become candidates.
    * Banded keys make the candidate join an equi-join — the LSH scale
    * path (no all-pairs comparison ever happens). */
  def lshBands(sig: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    val rowsPerBand = k / bands
    val banded = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"h$j"))
      sig.select(col(idCol), lit(b).as("band"),
        concat_ws(",", cols.map(_.cast("string")): _*).as("band_key"))
    }
    banded.reduce(_ unionByName _)
  }

  /** 60-bit SimHash from word-occurrence md5 hashes: bit i is set iff the
    * (+1/−1) vote sum over all word occurrences is positive. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = df.select(col(idCol), explode(words(col(textCol))).as("word"))
      .withColumn("h", md5Long(col("word")))
    tokens
      .select(col(idCol), col("h"),
        explode(sequence(lit(0), lit(59))).as("i"))
      .withColumn("vote",
        expr("CAST(shiftright(h, CAST(i AS INT)) & 1 AS INT) * 2 - 1"))
      .groupBy(idCol, "i")
      .agg(sum(col("vote")).as("s"))
      .groupBy(idCol)
      .agg(sum(when(col("s") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(i AS INT))")).otherwise(lit(0L)))
        .as("simhash"))
  }
}
