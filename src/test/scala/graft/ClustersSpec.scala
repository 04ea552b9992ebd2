package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Clusters

/** D8 cluster resolution: the large-star/small-star fixpoint must
  * equal exact union-find on every graph shape — fuzzed random
  * graphs, deep chains (where naive label propagation would need
  * O(n) rounds), cycles, and star collisions.
  */
class ClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Exact reference: union-find with path compression. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical root = min of component — find() already roots at the
    // min because unions always attach the larger root under the
    // smaller one
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.clusterPairs(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random graphs match exact union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 60 + trial * 30
      val m = n / 2 + rnd.nextInt(n) // sparse → several components
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(run(edges) == unionFind(edges), s"trial $trial")
    }
  }

  test("a 200-link chain resolves to one cluster in O(log n) rounds") {
    // a chain is the worst case for per-round min-label propagation
    // (diameter rounds); star rewriting must close it well inside the
    // round cap
    val chain = (0L until 200L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size == 201 && got.values.forall(_ == 0L))
  }

  test("cycles, duplicate and reversed pairs do not split clusters") {
    val edges = Seq((5L, 9L), (9L, 5L), (9L, 14L), (14L, 5L), (5L, 9L),
      (20L, 21L))
    val got = run(edges)
    assert(got == Map(5L -> 5L, 9L -> 5L, 14L -> 5L,
      20L -> 20L, 21L -> 20L))
  }

  test("empty pair list yields an empty cluster table") {
    assert(run(Seq.empty).isEmpty)
  }

  test("cross-block LSH clusters equal union-find on the real pair list") {
    val sf = "/root/testdata/sf0.001"
    val pairs = graft.operators.Dedup.jaccardPairsLsh(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = graft.operators.Clusters.nearDupClustersLsh(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(pairs))
  }

  test("two stars joined by a bridge merge under the global minimum") {
    val star1 = (1L to 5L).map(i => (0L, i))
    val star2 = (101L to 105L).map(i => (100L, i))
    val got = run(star1 ++ star2 :+ (5L, 105L))
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L to 5L).toSet ++ (100L to 105L).toSet)
  }
}
