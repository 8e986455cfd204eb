package graft

import graft.ops.Components

/** Connected-components kernel: min-label fast path, the
  * large-star/small-star escalation, and their agreement. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], escalateAfter: Int)
      : Map[Long, Long] =
    Components.connectedComponents(edges.toDF("u", "v"), escalateAfter)
      .as[(Long, Long)].collect().toMap

  test("200-diameter chain converges via star escalation (round-2 cap failed here)") {
    val chain = (0L until 200L).sliding(2).map(s => (s(0), s(1))).toSeq
    // diameter 199 >> the 10-round phase-1 budget: completion proves
    // the escalation engaged; labels must still be the component min
    val got = cc(chain, escalateAfter = Components.EscalateAfterRounds)
    assert(got.size == 200)
    assert(got.values.forall(_ == 0L))
  }

  test("star phase alone labels multi-component graphs with the min") {
    // two chains + a triangle + an isolated pair, shuffled ids
    val edges = Seq((5L, 9L), (9L, 12L), (12L, 3L),   // comp 3
      (20L, 25L), (25L, 21L),                         // comp 20
      (30L, 31L), (31L, 32L), (32L, 30L),             // comp 30 (cycle)
      (40L, 41L))                                     // comp 40
    val want = Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 12L -> 3L,
      20L -> 20L, 21L -> 20L, 25L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L, 40L -> 40L, 41L -> 40L)
    // escalateAfter = 0 skips phase 1 entirely — pure star path
    assert(cc(edges, escalateAfter = 0) == want)
    // and the min-label path (budget >> diameter) agrees exactly
    assert(cc(edges, escalateAfter = 50) == want)
  }

  test("empty edge list yields empty labels on both paths") {
    val empty = Seq.empty[(Long, Long)]
    assert(cc(empty, escalateAfter = 0).isEmpty)
    assert(cc(empty, escalateAfter = 5).isEmpty)
  }

  test("uniqueOrderedPairs fast path == general star path == min-label path") {
    // round-10 path: escalateAfter=0 + caller-warranted unique u<v
    // input skips the symmetric closure and the filter+distinct; the
    // labels must be identical to both general paths on graphs that
    // exercise chains, cycles, and multiple components
    for (seed <- 10 to 13) {
      val rnd = new scala.util.Random(seed)
      val n = 50
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct // unique, u < v — the warranted shape
      val fast = Components.connectedComponents(edges.toDF("u", "v"),
        escalateAfter = 0, uniqueOrderedPairs = true)
        .as[(Long, Long)].collect().toMap
      assert(fast == cc(edges, escalateAfter = 0))
      assert(fast == cc(edges, escalateAfter = 50))
    }
  }

  test("both paths agree with a union-find reference on seeded random graphs") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // min-rooted union-find: merging always keeps the smaller root,
      // so every tree's root IS the component minimum
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x
        else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = edges.flatMap(t => Seq(t._1, t._2)).distinct
      val want = verts.map(v => v -> find(v.toInt).toLong).toMap
      assert(cc(edges, escalateAfter = 0) == want, s"star path, seed $seed")
      assert(cc(edges, escalateAfter = 50) == want, s"min-label path, seed $seed")
    }
  }
}
