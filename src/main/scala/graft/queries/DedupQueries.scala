package graft.queries

import graft.Tables
import graft.ops.{Components, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._

/** Deduplication family over `documents` / `embeddings` (north-star ops):
  * exact hash-groupBy, n-gram Jaccard, MinHash+LSH banding, SimHash, and
  * embedding-cosine near-dup. Every hash derives from md5 so the full
  * pipelines — including LSH candidate generation — are bit-reproducible
  * in the DuckDB oracle.
  *
  * Scale design: none of these queries ever materializes the n² pair
  * space. Jaccard pairs come from the shingle inverted-index join;
  * MinHash/SimHash candidates come from band-key equi-joins; only the
  * embedding near-dup baseline is quadratic (kept as the correctness
  * baseline — the ANN queries in SimilarityQueries are the scale path). */
object DedupQueries extends QueryRegistry {

  /** DuckDB CTEs shared by the shingle-based queries (dual of
    * TextOps.shinglesHashedLocal): `sh` carries the md5-derived 60-bit
    * hash of each distinct shingle — the engines join/count on identical
    * 8-byte keys (collisions, if any, collapse identically). */
  private val shingleCtes =
    """w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |sh_s AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
      |         FROM w, unnest(generate_series(1, len(words) - 2)) AS t(i)),
      |sh AS MATERIALIZED (SELECT doc_id,
      |         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle
      |       FROM sh_s),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)""".stripMargin

  // ---- Exact dedup: hash-groupBy. Corpus-level counts plus duplicate
  // groups (min doc_id is the canonical keeper, as dropDuplicates would
  // keep under a deterministic sort).
  private val exact = NamedQuery(
    "dedup_exact",
    (spark, d) => Tables.documents(spark, d)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("n")).as("n_docs"),
        sum(when(col("n") > 1, col("n") - 1).otherwise(0)).as("n_removable"),
        countDistinct(when(col("n") > 1, col("text_md5"))).as("n_dup_groups")),
    // CAST sums to BIGINT: DuckDB sum(BIGINT) yields HUGEINT, which the
    // driver's pandas bridge renders as float ("500.0" vs Spark's "500")
    // and the value-hash comparison then mismatches.
    Some("""SELECT count(*) AS n_groups, CAST(sum(n) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) AS n_removable,
        |  count(DISTINCT CASE WHEN n > 1 THEN text_md5 END) AS n_dup_groups
        |FROM (SELECT md5(text) AS text_md5, count(*) AS n, min(doc_id) AS keeper
        |      FROM documents GROUP BY 1) g""".stripMargin))

  // ---- Exact dedup, materialized: the deduplicated corpus itself — one
  // keeper row per distinct text (min doc_id, the dropDuplicates-under-
  // deterministic-sort contract), plus how many copies it absorbed. This
  // is the output shape a pipeline actually writes back to storage.
  private val exactKeepers = NamedQuery(
    "dedup_exact_keepers",
    (spark, d) => Tables.documents(spark, d)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .select(col("keeper"), col("text_md5"), col("n_copies"))
      .orderBy("keeper"),
    Some("""SELECT min(doc_id) AS keeper, md5(text) AS text_md5,
        |  count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keeper""".stripMargin))

  // ---- n-gram Jaccard near-dup: inverted-index join, θ=0.8 (the fixture
  // plants ~25 pairs ≥0.9 with a clean margin below 0.1).
  private val ngram = NamedQuery(
    "dedup_ngram_jaccard",
    (spark, d) => {
      // prefix-filtered exact join (TextOps.jaccardPairsPrefix): only
      // each doc's |d|−⌈0.8·|d|⌉+1 smallest hashed shingles are indexed,
      // then candidates are verified by exact sorted-merge intersection —
      // output provably identical to the full inverted-index join the
      // oracle runs, at ~5× less index+aggregate volume
      TextOps.jaccardPairsPrefix(Tables.documents(spark, d), "doc_id", "text", 3, 0.8)
        .select(col("id1"), col("id2"), col("jaccard"))
        .orderBy("id1", "id2")
    },
    Some(s"""WITH $shingleCtes,
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2,
        |  round(inter / CAST(s1.sz + s2.sz - inter AS DOUBLE), 6) AS jaccard
        |FROM inter
        |JOIN sizes s1 ON id1 = s1.doc_id
        |JOIN sizes s2 ON id2 = s2.doc_id
        |WHERE round(inter / CAST(s1.sz + s2.sz - inter AS DOUBLE), 6) >= 0.8
        |ORDER BY id1, id2""".stripMargin))

  // ---- n-gram Jaccard with the WEB-SCALE guard: document-frequency cap
  // on the inverted index. A shingle occurring in many documents
  // contributes df² candidate pairs (the Σ_shingle df² blowup); dropping
  // shingles with df > cap from CANDIDATE GENERATION bounds the join,
  // while exact Jaccard is still verified on the FULL shingle sets of
  // the candidates — identical scores, recall traded only for pairs
  // whose every shared shingle is hot (none in real near-dup corpora,
  // none here). The oracle runs the identical capped algorithm.
  private val ngramCapped = NamedQuery(
    "dedup_ngram_capped",
    (spark, d) => {
      // array-kernel formulation (TextOps.jaccardPairsCapped): candidates
      // from the df≤10 index, exact sorted-merge verify over the full
      // shingle arrays — no second full inverted-index pass just to score
      // the survivors
      TextOps.jaccardPairsCapped(Tables.documents(spark, d), "doc_id", "text",
          3, maxDf = 10L, minJaccard = 0.8)
        .select(col("id1"), col("id2"), col("jaccard"))
        .orderBy("id1", "id2")
    },
    Some(s"""WITH $shingleCtes,
        |rare AS (
        |  SELECT sh.doc_id, sh.shingle FROM sh
        |  JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 10) r
        |    USING (shingle)),
        |cand AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
        |inter AS (
        |  SELECT c.id1, c.id2, count(*) AS inter
        |  FROM cand c
        |  JOIN sh a ON a.doc_id = c.id1
        |  JOIN sh b ON b.doc_id = c.id2 AND b.shingle = a.shingle
        |  GROUP BY 1, 2)
        |SELECT id1, id2,
        |  round(inter / CAST(s1.sz + s2.sz - inter AS DOUBLE), 6) AS jaccard
        |FROM inter
        |JOIN sizes s1 ON id1 = s1.doc_id
        |JOIN sizes s2 ON id2 = s2.doc_id
        |WHERE round(inter / CAST(s1.sz + s2.sz - inter AS DOUBLE), 6) >= 0.8
        |ORDER BY id1, id2""".stripMargin))

  // ---- MinHash + LSH banding: 16 md5-seeded min-hashes, 4 bands × 4
  // rows; band-key equi-join yields candidates; exact Jaccard verifies.
  // With 4 rows/band, P(candidate) = 1-(1-j⁴)⁴: ≈ 0.88 at j=0.8 (the
  // θ boundary — a true-0.8 pair is MISSED with ≈ 0.12 probability;
  // the round-10 claim of "≈ 0.98 at j=0.8" was the j=0.9 value,
  // arithmetic corrected in review r11) and ≈ 0.986 at j=0.9, where
  // the fixture's planted pairs sit — there recall ≈ 1 and the
  // verified output coincides with exact Jaccard ON THIS CORPUS. The
  // oracle replays the IDENTICAL banding (LSH-vs-LSH — it pins the
  // pipeline, not LSH recall; the recall trade is SCALE.md "Known
  // divergences").
  private val minhashK = 16
  private val minhashBands = 4

  /** DuckDB dual of TextOps.minhashSignatures' affine family member j —
    * `shingle` in the shared CTE is already the md5-derived 60-bit long,
    * so the base is just a mask of it. */
  private def minhashSqlHash(j: Int): String = {
    val (a, b) = TextOps.minhashFamily(minhashK)(j)
    s"($a * (shingle & 1073741823) + $b) % ${TextOps.minhashPrime}"
  }

  /** Shared banded-LSH → exact-verify pipeline: the verified near-dup
    * pair relation (id1 < id2, jaccard ≥ 0.8) both dedup_minhash_lsh and
    * dedup_source_matrix consume. Signatures are computed ROW-LOCALLY
    * (one narrow map — no corpus shingle explode, no per-doc window
    * sort); checkpointed because the 4-way band union self-joins the
    * relation 8×. Only CANDIDATE docs are ever shingled for the exact
    * verify (at scale: |candidates| ≪ corpus — for DISTINCT documents;
    * see below).
    *
    * Duplicate GROUPS (r9 review): k exact/near copies of one template
    * agree on every band, so the band join emits C(k,2) candidates —
    * but that is the OUTPUT, not waste: an exact pair LISTING at
    * jaccard ≥ 0.8 genuinely contains those C(k,2) rows, so no
    * algorithm that returns this relation avoids them (unlike the
    * embedding family's cellCap, which bounds a top-k SEARCH where
    * dropping candidates only trades recall). The declared 100 TB
    * posture is therefore COMPOSITION: run exact dedup first
    * (dedup_exact_keepers — one groupBy, collapses every k-copy
    * template group to 1 row — exactly what pipeline_curate and
    * pipeline_train_mix do upstream), after which surviving bucket
    * groups are genuine near-dup sets whose pair lists are the answer;
    * downstream consumers that only need CLUSTERS should consume
    * dedup_clusters' components, never the raw pair list. */
  /** LSH band-bucket candidate pairs (id1 < id2), UNVERIFIED — the raw
    * recall surface of the 4×4 banding scheme, before exact-Jaccard
    * verification. Shared by [[minhashVerifiedPairs]] (which verifies
    * them) and dedup_minhash_recall (which measures them against exact
    * ground truth). Signatures are row-local (one narrow map, no corpus
    * shingle explode) and checkpointed because the 4-way band union
    * self-joins the relation 8×. */
  private def bandCandidates(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sig = TextOps.minhashSignaturesLocal(docs, "doc_id", "text", 3, minhashK)
      .localCheckpoint()
    val bands = TextOps.lshBands(sig, "doc_id", minhashK, minhashBands)
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
  }

  private[graft] def minhashVerifiedPairs(
      spark: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(spark, d)
    val cand = bandCandidates(docs)
      // candDocs (→ arrs) and scoredPairs both consume the candidates:
      // pin them, or the 8-way band join + distinct run twice
      .localCheckpoint()
    val candDocs = cand.select(col("id1").as("doc_id"))
      .union(cand.select(col("id2"))).distinct()
    val arrs = TextOps.shingleArraysLocal(
      docs.join(candDocs, "doc_id").select(col("doc_id"), col("text")),
      "doc_id", "text", 3).localCheckpoint()
    TextOps.scoredPairs(cand, arrs, "doc_id", 0.8, spreadVerify = true)
  }

  /** DuckDB dual of minhashVerifiedPairs, up to a `pairs(id1, id2,
    * jaccard)` CTE (caller appends its own final SELECT).
    *
    * Oracle-side scale note (r13, sf10 gate): the exact-verify `inter`
    * CTE drives FROM the MATERIALIZED candidate relation (cand → sh
    * per side, shingle-equality on the second join) instead of the
    * historical `sh a JOIN sh b ON shingle` form restricted by cand
    * afterwards — at 500k docs DuckDB ordered the shingle self-join
    * first, a Σ_shingle df² intermediate that spilled 58 GB and was
    * killed approaching the disk. Decision-identical: sh is DISTINCT
    * per (doc, shingle) and cand carries id1 < id2, so the count per
    * (id1, id2) is the same intersection size. */
  /** DuckDB dual of [[bandCandidates]] — sig/bands/candidate CTEs, with
    * the candidate CTE named `candName` so dedup_minhash_recall can
    * compose it alongside the exact-truth candidate CTEs without a name
    * clash. */
  private def minhashCandSqlCtes(candName: String): String = {
    val minCols = (0 until minhashK)
      .map(j => s"min(${minhashSqlHash(j)}) AS h$j").mkString(",\n    ")
    // rows-per-band DERIVED from the two constants, mirroring
    // lshBands' k % bands == 0 contract — a hard-coded 4 would silently
    // desync the oracle's candidate set if either constant changed
    val rpb = minhashK / minhashBands
    val bandSelects = (0 until minhashBands).map { b =>
      val cols = (b * rpb until b * rpb + rpb).map(j => s"h$j").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws(',', $cols) AS band_key FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""sig AS (
       |  SELECT doc_id,
       |    $minCols
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |$candName AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)""".stripMargin
  }

  private def minhashPairsSqlCtes: String = {
    s"""$shingleCtes,
       |${minhashCandSqlCtes("cand")},
       |inter AS (
       |  SELECT c.id1, c.id2, count(*) AS inter
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.id1
       |  JOIN sh b ON b.doc_id = c.id2 AND b.shingle = a.shingle
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id1, id2,
       |    round(inter / CAST(s1.sz + s2.sz - inter AS DOUBLE), 6) AS jaccard
       |  FROM inter
       |  JOIN sizes s1 ON id1 = s1.doc_id
       |  JOIN sizes s2 ON id2 = s2.doc_id
       |  WHERE round(inter / CAST(s1.sz + s2.sz - inter AS DOUBLE), 6) >= 0.8)""".stripMargin
  }

  private val minhash = NamedQuery(
    "dedup_minhash_lsh",
    (spark, d) => minhashVerifiedPairs(spark, d)
      .select(col("id1"), col("id2"), col("jaccard"))
      .orderBy("id1", "id2"),
    Some(s"""WITH $minhashPairsSqlCtes
         |SELECT id1, id2, jaccard FROM pairs ORDER BY id1, id2""".stripMargin))

  // ---- Cross-source near-dup audit matrix: where do the near-dups COME
  // FROM? Every verified LSH pair maps to its (source, source) cell
  // (order-normalized), yielding the contamination matrix a corpus audit
  // reads to find e.g. a crawl slice that duplicates a curated slice.
  // Scale shape: the pair relation (≪ corpus) joins the (doc_id, source)
  // projection twice — shuffle-hash on doc_id, the same exchange key the
  // pair relation already carries; the matrix itself is
  // |sources|²-bounded, a broadcast-sized result at any corpus size.
  private val sourceMatrix = NamedQuery(
    "dedup_source_matrix",
    (spark, d) => {
      val src = Tables.documents(spark, d).select(col("doc_id"), col("source"))
      minhashVerifiedPairs(spark, d)
        .join(src.select(col("doc_id").as("id1"), col("source").as("src1")), "id1")
        .join(src.select(col("doc_id").as("id2"), col("source").as("src2")), "id2")
        .select(least(col("src1"), col("src2")).as("src_a"),
          greatest(col("src1"), col("src2")).as("src_b"),
          col("jaccard"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).cast("bigint").as("n_pairs"),
          // rule 12: jaccard values are 6dp-grid rationals, so a 2-pair
          // cell's mean can land EXACTLY on a 6dp half-boundary and
          // round(avg, 6) would tie-break differently per engine. Sum
          // the exact micro-jaccard integers, emit the mean RAW —
          // identical integers through one fixed division chain are
          // bit-identical doubles in both engines.
          (sum(round(col("jaccard") * 1000000, 0).cast("decimal(38,0)"))
            .cast("double") / lit(1000000.0) / count(lit(1))).as("avg_jaccard"))
        .orderBy("src_a", "src_b")
    },
    Some(s"""WITH $minhashPairsSqlCtes,
         |lab AS (
         |  SELECT least(d1.source, d2.source) AS src_a,
         |    greatest(d1.source, d2.source) AS src_b, jaccard
         |  FROM pairs
         |  JOIN documents d1 ON id1 = d1.doc_id
         |  JOIN documents d2 ON id2 = d2.doc_id)
         |SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CAST(round(jaccard * 1000000, 0) AS BIGINT)) AS DOUBLE)
         |    / 1000000.0 / count(*) AS avg_jaccard
         |FROM lab GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin))

  // ---- SimHash: 60-bit signatures from word-occurrence votes.
  private val simhashQ = NamedQuery(
    "dedup_simhash",
    (spark, d) => TextOps.simhashLocal(Tables.documents(spark, d), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |               FROM documents),
        |h AS (SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h FROM tok),
        |bits AS (SELECT doc_id, i, sum(CAST((h >> i) & 1 AS INT) * 2 - 1) AS s
        |         FROM h, unnest(generate_series(0, 59)) t(i) GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT)
        |    AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  // ---- SimHash near-dup pairs: 4×15-bit band blocking (a pair within
  // hamming ≤ 3 must agree on ≥1 band — pigeonhole), then exact hamming.
  private val simhashPairs = NamedQuery(
    "dedup_simhash_pairs",
    (spark, d) => {
      val sig = TextOps.simhashLocal(Tables.documents(spark, d), "doc_id", "text")
        .localCheckpoint()
      val bands = (0 until 4).map(b =>
        sig.select(col("doc_id"), lit(b).as("band"),
          expr(s"shiftright(simhash, ${b * 15}) & 32767").as("bkey"),
          col("simhash"))).reduce(_ unionByName _)
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
          expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("id1", "id2")
    },
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |               FROM documents),
        |h AS (SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h FROM tok),
        |bits AS (SELECT doc_id, i, sum(CAST((h >> i) & 1 AS INT) * 2 - 1) AS s
        |         FROM h, unnest(generate_series(0, 59)) t(i) GROUP BY 1, 2),
        |sig AS (SELECT doc_id,
        |          CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
        |               AS BIGINT) AS simhash
        |        FROM bits GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, band, (simhash >> (band * 15)) & 32767 AS bkey, simhash
        |  FROM sig, unnest(generate_series(0, 3)) t(band))
        |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY id1, id2""".stripMargin))

  // ---- Embedding-cosine near-dup: the exact quadratic baseline, run as
  // a broadcast-matrix kernel (no joined-row materialization; the kernel
  // pre-filters on raw cosine safely below θ, then the EXACT rounded
  // predicate is applied — bit-identical to the declarative self-join,
  // SimilarityKernelSpec).
  private val embCosine = NamedQuery(
    "dedup_embedding_cosine",
    (spark, d) => {
      val v = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding"))
      SimilarityOps.allPairsCosineLocal(v, "vec_id", "embedding", 0.45 - 1e-5)
        .select(col("id1"), col("id2"), round(col("raw_cos"), 6).as("cosine"))
        .filter(col("cosine") >= 0.45)
        .orderBy("id1", "id2")
    },
    Some("""SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |        CAST(b.embedding AS DOUBLE[])), 6) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |        CAST(b.embedding AS DOUBLE[])), 6) >= 0.45
        |ORDER BY id1, id2""".stripMargin))

  // ---- Embedding near-dup, blocked: the scale path for the quadratic
  // baseline above. Vectors are coarse-quantized to their nearest
  // centroid (same deterministic IVF cells as sim_ann_ivf, one kernel
  // pass against the broadcast centroid matrix), then cells are capped
  // at cellCap members by sim_c-banding (the second IVF level);
  // candidate pairs only form INSIDE a (cell, band) block, so pair cost
  // is bounded by cellCap·N — linear in the corpus, not Σ_cell |cell|².
  // Cross-block near-dups are the recall trade — the oracle runs the
  // identical two-level blocking, so the gate stays exact.
  private val embCosineBlocked = NamedQuery(
    "dedup_embedding_blocked",
    (spark, d) => {
      val v = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
      val stride =
        SimilarityOps.centroidStride(Tables.rowCount(spark, d, "embeddings"))
      val cent = v.filter(col("vec_id") % stride === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      val assign = SimilarityOps.bandCells(SimilarityOps.assignNearestCell(
          spark, v, "vec_id", "embedding", cent,
          carryEmbedding = true, carrySim = true))
        .select(col("vec_id"), col("cid"), col("band"), col("embedding"))
        .localCheckpoint() // the block self-join reads the assignment twice
      assign.as("a").join(assign.as("b"),
          col("a.cid") === col("b.cid") && col("a.band") === col("b.band") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
          SimilarityOps.cosineNative6(spark,
            col("a.embedding"), col("b.embedding")).as("cosine"))
        .filter(col("cosine") >= 0.4)
        .orderBy("id1", "id2")
    },
    // the assign CTE deliberately does NOT carry emb (a ~1 KB list per
    // row through the N×cells cross join spilled ~90 GB at sf10 — the
    // pair stage re-joins v for the two embeddings it actually scores;
    // result-identical, vec_id is the key and a null vec_id can never
    // survive the a.vec_id < b.vec_id pair condition) and uses the
    // STREAMING group-by-max form (SimilarityOps.assignSqlCtes) — the
    // slim window sort alone still outgrew the disk
    Some(s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |${SimilarityOps.centroidSqlCte},
        |${SimilarityOps.assignSqlCtes},
        |${SimilarityOps.bandSqlCte}
        |SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  round(list_cosine_similarity(va.emb, vb.emb), 6) AS cosine
        |FROM banded a JOIN banded b
        |  ON a.cid = b.cid AND a.band = b.band AND a.vec_id < b.vec_id
        |JOIN v va ON va.vec_id = a.vec_id
        |JOIN v vb ON vb.vec_id = b.vec_id
        |WHERE round(list_cosine_similarity(va.emb, vb.emb), 6) >= 0.4
        |ORDER BY id1, id2""".stripMargin))

  // ---- Dedup clusters: near-dup PAIRS → connected components → one
  // canonical keeper per cluster. The stage every real dedup pipeline
  // needs between candidate generation and document dropping; a
  // driver-side union-find doesn't exist at 100 TB, so this runs
  // Components.connectedComponents (iterative min-label propagation).
  // Edges are the MinHash-LSH verified pairs (minhashVerifiedPairs —
  // banded candidates, exact Jaccard ≥ 0.8 on candidates only), the
  // corpus-scale pair source a production pipeline feeds clustering
  // from; the inverted-index pair join the r6 version used grows its
  // candidate set with Σ df² and went 20× super-linear in the sf1
  // headroom run (SCALE.md). The oracle replays the identical
  // banding+verify CTEs, then folds the component fixed point
  // (min reachable doc_id) with a recursive reachability CTE, so the
  // whole signature→pair→cluster pipeline stays hash-checked.
  private val clusters = NamedQuery(
    "dedup_clusters",
    (spark, d) => {
      val pairs = minhashVerifiedPairs(spark, d)
        .select(col("id1").as("src"), col("id2").as("dst"))
      val comp = Components.connectedComponents(pairs)
      val sizes = comp.groupBy("component").agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, "component")
        .select(col("id").as("doc_id"), col("component").as("cluster"),
          col("cluster_size"),
          // the keeper is the min-id member, exactly what dropDuplicates
          // under a deterministic sort would keep
          (col("id") === col("component")).as("is_keeper"))
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $minhashPairsSqlCtes,
        |edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
        |          UNION ALL SELECT id2, id1 FROM pairs),
        |reach(node, label) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
        |comp AS (SELECT node AS doc_id, min(label) AS cluster
        |         FROM reach GROUP BY node)
        |SELECT c.doc_id, c.cluster, n.cluster_size,
        |  c.doc_id = c.cluster AS is_keeper
        |FROM comp c JOIN (SELECT cluster, count(*) AS cluster_size
        |                  FROM comp GROUP BY 1) n USING (cluster)
        |ORDER BY doc_id""".stripMargin))

  // ---- INCREMENTAL dedup: dedupe a new batch against an already-curated
  // corpus — the steady-state shape of a production pipeline (the full
  // corpus is never re-deduped; each ingest batch anti-joins the existing
  // hash set, then dedupes within itself). Existing = doc_id % 5 ≠ 0,
  // batch = doc_id % 5 = 0. At scale the existing side is a hash-only
  // relation (16-byte md5 per doc), NOT the corpus.
  private val incremental = NamedQuery(
    "dedup_incremental",
    (spark, d) => {
      val docs = Tables.documents(spark, d)
      val existing = docs.filter(col("doc_id") % 5 =!= 0)
        .select(md5(col("text")).as("text_md5")).distinct()
      val batch = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), md5(col("text")).as("text_md5"))
      batch.join(existing, Seq("text_md5"), "left_anti")
        .groupBy("text_md5")
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_in_batch"))
        .select(col("keeper"), col("text_md5"), col("n_in_batch"))
        .orderBy("keeper")
    },
    Some("""WITH existing AS (
        |  SELECT DISTINCT md5(text) AS text_md5 FROM documents WHERE doc_id % 5 <> 0),
        |batch AS (
        |  SELECT doc_id, md5(text) AS text_md5 FROM documents WHERE doc_id % 5 = 0)
        |SELECT min(doc_id) AS keeper, text_md5, count(*) AS n_in_batch
        |FROM batch b
        |WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.text_md5 = b.text_md5)
        |GROUP BY text_md5
        |ORDER BY keeper""".stripMargin))

  // ---- SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
  // = cluster embeddings, then inside each cluster drop every point that
  // has a cosine-near neighbor EARLIER in farthest-from-centroid order —
  // the paper's keep-rule retains the cluster's outliers (low similarity
  // to centroid) and prunes the redundant core. Differs from
  // dedup_embedding_blocked in both output contract (a keep/drop
  // decision per vector, not a pair list) and the keep-rule (centroid
  // geometry, not min-id). Scale: assignment is ONE kernel pass against
  // the broadcast centroid matrix (assignNearestCell, which also emits
  // sim_c — the cosine the keep-rule orders by); clusters are capped at
  // cellCap members by sim_c-banding (the second IVF level), so the
  // prune self-join is block-local and bounded by the constant cellCap²
  // per block — linear in the corpus, not Σ|cell|² (SemDeDup's own cost
  // model makes cluster GRANULARITY the dial; banding is that dial made
  // deterministic). The prune window partitions by (cid, band). The
  // cosine threshold sits IN the join condition, so sub-threshold pairs
  // never materialize past the join.
  private val semantic = NamedQuery(
    "dedup_semantic",
    (spark, d) => {
      val v = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
      val stride =
        SimilarityOps.centroidStride(Tables.rowCount(spark, d, "embeddings"))
      val cent = v.filter(col("vec_id") % stride === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      val assign = SimilarityOps.assignNearestCell(
        spark, v, "vec_id", "embedding", cent,
        carryEmbedding = true, carrySim = true)
      // ord is read three times (both prune sides + the final keep join)
      val ord = SimilarityOps.bandCells(assign).localCheckpoint()
      val dropped = ord.as("a").join(ord.as("b"),
          col("a.cid") === col("b.cid") && col("a.band") === col("b.band") &&
            col("a.pos") < col("b.pos") &&
            SimilarityOps.cosineNative6(spark,
              col("a.embedding"), col("b.embedding")) >= 0.4)
        .select(col("b.vec_id").as("vec_id")).distinct()
      // no broadcast hint: `dropped` is O(points) in the worst case —
      // AQE picks broadcast when the actual drop set is small
      ord.join(dropped.withColumn("dup", lit(1)), Seq("vec_id"), "left")
        .select(col("vec_id"), col("cid"), col("sim_c"),
          when(col("dup").isNotNull, 0).otherwise(1).as("kept"))
        .orderBy("vec_id")
    },
    // emb-free, streaming assign CTE + v re-join in the prune stage,
    // same reasons (and same result identity) as the
    // dedup_embedding_blocked oracle: the list-carrying cross join
    // spilled ~90 GB at sf10, and the slim window sort still outgrew
    // the disk
    Some(s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |${SimilarityOps.centroidSqlCte},
        |${SimilarityOps.assignSqlCtes},
        |${SimilarityOps.bandSqlCte},
        |dropped AS (SELECT DISTINCT b.vec_id FROM banded a JOIN banded b
        |            ON a.cid = b.cid AND a.band = b.band AND a.pos < b.pos
        |            JOIN v va ON va.vec_id = a.vec_id
        |            JOIN v vb ON vb.vec_id = b.vec_id
        |            WHERE round(list_cosine_similarity(va.emb, vb.emb), 6) >= 0.4)
        |SELECT o.vec_id, o.cid, o.sim_c,
        |  CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
        |FROM banded o LEFT JOIN dropped d ON o.vec_id = d.vec_id
        |ORDER BY o.vec_id""".stripMargin))

  // ---- MinHash/LSH recall audit: measure the banding scheme's ACTUAL
  // candidate recall as a function of true Jaccard — the evaluation a
  // pipeline runs BEFORE trusting an LSH dedup config at 100 TB (the
  // dedup-side twin of sim_ann_recall). The corpus's own near-dups all
  // sit at j ≥ 0.9 where 4×4 banding is ~perfect (the r14 first-draft
  // of this query measured exactly one bucket at recall 1.0 — vacuous),
  // so the audit PLANTS a mid-Jaccard pair per document: doc ⋈ its own
  // word-prefix, keep-fraction 0.5 + (doc_id mod 5)/10 ∈ {0.5 … 0.9} —
  // prefix-shingle containment puts true Jaccard ≈ the kept fraction,
  // spreading truth across buckets 4–9. Banding runs over the UNION
  // corpus (full docs + prefixes — 2N signatures, the honest setting:
  // candidates compete with every band bucket, not just the planted
  // pair); recall per bucket is then the measured banding curve, to be
  // read against theory P = 1−(1−j⁴)⁴ (≈ 0.23 at j=0.5, 0.67 at 0.7,
  // 0.99 at 0.9). Scale shape: prefix synthesis is a narrow row-local
  // map; signatures row-local; the only joins are the band-bucket
  // equi-join and the planted-pair verify (N pairs, sorted-merge
  // arrays). The oracle replays BOTH pipelines bit-identically (md5
  // shingles, identical affine family), so every bucket hash-matches.
  private val minhashRecall = NamedQuery(
    "dedup_minhash_recall",
    (spark, d) => {
      val ws = TextOps.words(col("text"))
      // ≥ 12 words keeps every prefix (≥ 6 words) carrying ≥ 4 shingles;
      // the isNotNull twin is the pushable half of that predicate (the
      // derived size(split(...)) form alone is opaque to the source —
      // the text_bpe_pairs convention, PlanSweepSpec check 4)
      val base = Tables.documents(spark, d)
        .filter(col("text").isNotNull && size(ws) >= 12)
        .select(col("doc_id"), col("text"))
      val keepFrac = lit(0.5) + pmod(col("doc_id"), lit(5)).cast("double") / lit(10.0)
      val pref = base.select((col("doc_id") + 10000000L).as("doc_id"),
        array_join(slice(ws, lit(1), ceil(size(ws) * keepFrac).cast("int")), " ")
          .as("text"))
      val corpus = base.unionByName(pref).localCheckpoint()
      val cand = bandCandidates(corpus)
      val planted = base.select(col("doc_id").as("id1"),
        (col("doc_id") + 10000000L).as("id2"))
      val arrs = TextOps.shingleArraysLocal(corpus, "doc_id", "text", 3)
      val truth = TextOps.scoredPairs(planted, arrs, "doc_id", 0.0)
        .select(col("id1"), col("id2"), col("jaccard"))
      truth.join(cand.withColumn("caught", lit(1L)), Seq("id1", "id2"), "left")
        .withColumn("bucket_x10",
          least(floor(col("jaccard") * 10), lit(9.0)).cast("long"))
        .groupBy("bucket_x10")
        .agg(count(lit(1)).as("n_truth"),
          sum(coalesce(col("caught"), lit(0L))).as("n_caught"))
        .withColumn("recall", round(col("n_caught") / col("n_truth"), 4))
        .orderBy("bucket_x10")
    },
    Some(s"""WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE len(string_split(text, ' ')) >= 12),
        |w0 AS (SELECT doc_id, string_split(text, ' ') AS words FROM base),
        |wp AS (SELECT doc_id + 10000000 AS doc_id,
        |         words[1:CAST(ceil(len(words) * (0.5 + (doc_id % 5) / 10.0))
        |                 AS BIGINT)] AS words
        |       FROM w0),
        |w AS (SELECT doc_id, words FROM w0
        |      UNION ALL SELECT doc_id, words FROM wp),
        |sh_s AS (SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
        |         FROM w, unnest(generate_series(1, len(words) - 2)) AS t(i)),
        |sh AS MATERIALIZED (SELECT doc_id,
        |         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle
        |       FROM sh_s),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |${minhashCandSqlCtes("lcand")},
        |planted AS (SELECT doc_id AS id1, doc_id + 10000000 AS id2 FROM base),
        |tinter AS (
        |  SELECT p.id1, p.id2, count(*) AS inter
        |  FROM planted p
        |  JOIN sh a ON a.doc_id = p.id1
        |  JOIN sh b ON b.doc_id = p.id2 AND b.shingle = a.shingle
        |  GROUP BY 1, 2),
        |truth AS (
        |  SELECT i.id1, i.id2,
        |    round(inter / CAST(s1.sz + s2.sz - inter AS DOUBLE), 6) AS jaccard
        |  FROM tinter i
        |  JOIN sizes s1 ON i.id1 = s1.doc_id
        |  JOIN sizes s2 ON i.id2 = s2.doc_id),
        |j AS (
        |  SELECT t.jaccard,
        |    CASE WHEN l.id1 IS NOT NULL THEN 1 ELSE 0 END AS caught
        |  FROM truth t LEFT JOIN lcand l ON t.id1 = l.id1 AND t.id2 = l.id2)
        |SELECT CAST(least(floor(jaccard * 10), 9) AS BIGINT) AS bucket_x10,
        |  count(*) AS n_truth,
        |  CAST(sum(caught) AS BIGINT) AS n_caught,
        |  round(sum(caught) / count(*), 4) AS recall
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[NamedQuery] =
    Seq(exact, exactKeepers, ngram, ngramCapped, minhash, sourceMatrix,
      simhashQ, simhashPairs, embCosine, embCosineBlocked, clusters,
      incremental, semantic, minhashRecall)
}
