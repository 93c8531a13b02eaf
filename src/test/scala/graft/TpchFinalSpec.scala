package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the final TPC-H wave (Q2/Q4/Q11/Q15/Q20 —
  * completing all 22 templates) and the train/val/test split census.
  * The DuckDB oracle pins exact values; these tests pin the CLAIMS the
  * queries make about themselves (minimality, threshold exceedance,
  * subset relations), recomputed independently where cheap.
  */
class TpchFinalSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q2_min_cost_supplier: one cost per part — only minimum-cost rows survive") {
    val rows = run("q2_min_cost_supplier").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // every row for the same part carries the same (minimal) cost
    rows.groupBy(_.getLong(3)).foreach { case (pk, rs) =>
      assert(rs.map(_.getDouble(4)).distinct.length == 1,
        s"part $pk emitted rows at different costs")
    }
    // descending acctbal order (first sort key)
    val bals = rows.map(_.getDouble(0))
    assert(bals.sliding(2).forall { case Array(a, b) => a >= b case _ => true })
  }

  test("q2_min_cost_supplier: emitted cost IS the regional minimum (recomputed)") {
    val out = run("q2_min_cost_supplier")
      .select(col("p_partkey"), col("cost")).distinct().collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent recompute: per (part, supplier) min unit price over
    // EUROPE suppliers, then the per-part min
    val bridge = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
    val eur = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val mins = bridge.join(eur, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey")).agg(min(col("cost")).as("mn"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { case (pk, c) =>
      assert(mins(pk) == c, s"part $pk: emitted $c, true regional min ${mins(pk)}")
    }
  }

  test("q4_priority_check: counts bounded by the quarter's order count, priorities sorted") {
    val rows = run("q4_priority_check").collect()
    assert(rows.nonEmpty)
    val prios = rows.map(_.getString(0)).toSeq
    assert(prios == prios.sorted && prios.distinct == prios)
    val quarter = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-10-01").cast("timestamp_ntz")).count()
    assert(rows.map(_.getLong(1)).sum <= quarter)
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("q11_important_stock: every emitted part exceeds 0.1% of the slice total (recomputed)") {
    val rows = run("q11_important_stock").collect()
    assert(rows.nonEmpty)
    val vals = rows.map(_.getLong(1))
    assert(vals.sliding(2).forall { case Array(a, b) => a >= b case _ => true })
    // recompute the full slice total (including parts below the cut)
    val cents = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
      .cast("long")
    val natSupp = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir)
        .filter(col("n_name").isin("NATION_3", "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val total = Tables.lineitem(spark, sfDir)
      .join(natSupp, col("l_suppkey") === col("s_suppkey"))
      .agg(sum(cents)).collect()(0).getLong(0)
    val cut = math.floor(total / 1000.0).toLong
    assert(vals.forall(_ > cut), s"row at or below cut=$cut")
  }

  test("q15_top_supplier: all rows tie at the global quarterly max revenue") {
    val rows = run("q15_top_supplier").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).distinct.length == 1)
  }

  test("q20_part_promotion: suppliers come from the nation slice; names sorted") {
    val rows = run("q20_part_promotion").collect()
    assert(rows.nonEmpty)
    val names = rows.map(_.getString(1)).toSeq
    assert(names == names.sorted)
    val sliceKeys = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir).filter(col("n_name").isin(
        "NATION_1", "NATION_2", "NATION_3", "NATION_5", "NATION_8")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => sliceKeys(r.getLong(0))))
  }

  test("q_split_train_val_test: split census is a partition of the corpus, train-heavy") {
    val rows = run("q_split_train_val_test").collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.documents(spark, sfDir).count())
    val bySplit = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    val train = bySplit.getOrElse("train", 0L).toDouble / total
    assert(train > 0.8 && train < 0.97, s"train fraction $train outside [0.8, 0.97]")
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    // deterministic: a second run yields the identical census
    val again = run("q_split_train_val_test").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
