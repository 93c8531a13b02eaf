package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Set operations (SURVEY.md §2.2 "Set ops" — absent from the reference,
  * part of the engine's breadth surface): UNION / UNION ALL / INTERSECT /
  * EXCEPT over derived key sets. Spark plans INTERSECT/EXCEPT as
  * left-semi/left-anti joins after distinct — both sides shuffle on the
  * compared columns once. */
object SetOpQueries extends QueryRegistry {

  // Nations that have customers vs nations that have suppliers.
  private def custNations(spark: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(spark, d).select(col("c_nationkey").as("nationkey")).distinct()
  private def suppNations(spark: org.apache.spark.sql.SparkSession, d: String) =
    Tables.supplier(spark, d).select(col("s_nationkey").as("nationkey")).distinct()

  private val intersectQ = NamedQuery(
    "q_set_intersect",
    (spark, d) => custNations(spark, d).intersect(suppNations(spark, d)).orderBy("nationkey"),
    Some("""SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin))

  // EXCEPT's subtrahend is RESTRICTED to one region's supplier nations
  // (VERDICT r12: the unrestricted form was vacuously green — customer
  // nations minus ALL supplier nations is empty at every scale factor,
  // so a broken EXCEPT returning 0 rows would also have passed). With
  // EUROPE's ~5 nations subtracted from the ~25 customer nations the
  // result is non-empty at every SF, making the hash gate prove
  // subtraction, not just execution.
  private val exceptQ = NamedQuery(
    "q_set_except",
    (spark, d) => {
      val europeSuppNations = Tables.supplier(spark, d)
        .join(broadcast(Tables.nation(spark, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_nationkey").as("nationkey")).distinct()
      custNations(spark, d).except(europeSuppNations).orderBy("nationkey")
    },
    Some("""SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |ORDER BY nationkey""".stripMargin))

  private val unionQ = NamedQuery(
    "q_set_union",
    (spark, d) => custNations(spark, d).union(suppNations(spark, d))
      .distinct().orderBy("nationkey"),
    Some("""SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin))

  // UNION ALL preserves duplicates — counted to make cardinality observable.
  private val unionAllQ = NamedQuery(
    "q_set_union_all",
    (spark, d) => Tables.customer(spark, d).select(col("c_nationkey").as("nationkey"))
      .union(Tables.supplier(spark, d).select(col("s_nationkey").as("nationkey")))
      .groupBy("nationkey").agg(count(lit(1)).as("n"))
      .orderBy("nationkey"),
    Some("""SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey FROM supplier) u
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin))

  val all: Seq[NamedQuery] = Seq(intersectQ, exceptQ, unionQ, unionAllQ)
}
