package graft

import org.scalatest.funsuite.AnyFunSuite

/** The binary-op queries (image tagging, multimodal features/thumbnails/
  * frame sampling) are hash-checked by the driver against committed
  * expectation fixtures (fixtures/expected/, written by
  * MakeExpectations). This spec is the build-time half of that gate: if
  * live output ever drifts from the committed fixture — a kernel change,
  * a JDK imaging difference, a reordered row — `sbt test` fails before
  * the driver does, and the failure names the first differing row. */
class ExpectationsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  MakeExpectations.queryNames.foreach { name =>
    test(s"$name matches its committed expectation fixture") {
      val fixture = new java.io.File(s"${MakeExpectations.fixtureDir}/$name.parquet")
      assert(fixture.isFile,
        s"missing $fixture — run `sbt \"runMain graft.MakeExpectations\"` and commit")
      val live = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val want = spark.read.parquet(fixture.getPath)
      assert(live.columns.toSeq == want.columns.toSeq,
        s"column drift: live=${live.columns.toSeq} fixture=${want.columns.toSeq}")
      val gotRows = live.collect()
      val wantRows = want.collect()
      assert(gotRows.length == wantRows.length,
        s"row count drift: live=${gotRows.length} fixture=${wantRows.length}")
      gotRows.zip(wantRows).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g == w, s"row $i drifted: live=$g fixture=$w")
      }
    }
  }

  test("every expectation-backed query declares the fixture replay as its oracle") {
    MakeExpectations.queryNames.foreach { name =>
      val sql = SparkEntry.oracleSql.get(name)
      assert(sql.exists(_.contains(s"$name.parquet")),
        s"$name oracle should read its expectation fixture, got $sql")
    }
  }
}
