package graft

import graft.ops.Components
import org.apache.spark.sql.functions._

/** Distributed connected components: the pair→cluster stage of the
  * dedup family. Fixed point is min-reachable-id per component, so
  * expectations are exact. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, triangles, singleton edges, and multi-component graphs") {
    // chain 1-2-3-4 (diameter > 1 forces multiple rounds), triangle
    // 10-11-12, isolated pair 20-21, self-loop 30
    val got = cc(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 10L -> 11L, 11L -> 12L,
      10L -> 12L, 20L -> 21L, 30L -> 30L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L, 30L -> 30L))
  }

  test("long path converges to one component (propagation over diameter)") {
    val n = 12L
    val got = cc((1L until n).map(i => i -> (i + 1)))
    assert(got === (1L to n).map(_ -> 1L).toMap)
  }

  test("pointer doubling: a 300-node path converges within the round budget") {
    // diameter 299 — plain 2-hop propagation needs 150 materialized
    // rounds and died at maxIter; pointer doubling closes it in O(log d)
    val n = 300L
    val got = cc((0L until n - 1).map(i => i -> (i + 1)))
    assert(got.size == n && got.values.forall(_ == 0L))
  }

  test("edge direction does not matter") {
    assert(cc(Seq(5L -> 3L, 3L -> 9L)) === Map(3L -> 3L, 5L -> 3L, 9L -> 3L))
  }

  test("empty edge list yields empty labels (no NPE from the observed metric)") {
    assert(cc(Seq.empty) === Map.empty)
  }

  test("randomized graphs match a union-find oracle") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val nNodes = 30 + rnd.nextInt(40)
      val nEdges = rnd.nextInt(60)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
      if (edges.nonEmpty) {
        // driver-side union-find oracle (test-only)
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // canonical label = min member id per component
        val byRoot = nodes.groupBy(find)
        val expected = byRoot.values.flatMap { members =>
          val m = members.min
          members.map(_ -> m)
        }.toMap
        assert(cc(edges) === expected, s"trial $trial ($nNodes nodes, $nEdges edges)")
      }
    }
  }

  test("superseded per-round checkpoints are unpersisted (bounded storage)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // diameter 7 → several rounds, each with its own localCheckpoint
    val labels = Components.connectedComponents(
      (1L until 8L).map(i => i -> (i + 1)).toDF("src", "dst"))
    labels.count()
    val added = sc.getPersistentRDDs.keySet -- before
    // only the FINAL labels checkpoint may remain pinned — the input,
    // symmetrized edges, and every superseded round must be freed
    assert(added.size <= 1, s"leaked ${added.size} persisted RDDs")
    // and the surviving frame is still readable after the frees
    assert(labels.count() === 8L)
  }

  private def ccStar(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponentsStar(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction: fixed shapes match label propagation") {
    val shapes = Seq(
      Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 10L -> 11L, 11L -> 12L,
        10L -> 12L, 20L -> 21L, 30L -> 30L),
      (1L until 12L).map(i => i -> (i + 1)),
      Seq(5L -> 3L, 3L -> 9L),
      Seq.empty[(Long, Long)])
    shapes.foreach(s => assert(ccStar(s) === cc(s), s"shape $s"))
  }

  test("star contraction: dense blocks and random graphs agree with the propagation algorithm") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      // a dense clique-ish block (the hot-LSH-bucket shape the star
      // algorithm exists for) plus random sparse edges
      val clique = for {
        i <- 0 until 8; j <- i + 1 until 8 if rnd.nextDouble() < 0.8
      } yield (i.toLong, j.toLong)
      val sparse = Seq.fill(30)(
        (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      val edges = clique ++ sparse
      assert(ccStar(edges) === cc(edges), s"trial $trial")
    }
  }

  test("star contraction: non-convergence releases its checkpoints before throwing") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    intercept[IllegalArgumentException] {
      // maxIter=0 with a non-empty graph: the loop never runs, converged
      // stays false, and the error path must free nodes + canonical edges
      Components.connectedComponentsStar(
        Seq(1L -> 2L, 2L -> 3L).toDF("src", "dst"), maxIter = 0)
    }
    assert(sc.getPersistentRDDs.keySet -- before === Set.empty,
      "non-convergence leaked persisted blocks")
  }

  test("star contraction: 120-node path converges within the round budget") {
    val got = ccStar((0L until 119L).map(i => i -> (i + 1)))
    assert(got.size == 120 && got.values.forall(_ == 0L))
  }
}
