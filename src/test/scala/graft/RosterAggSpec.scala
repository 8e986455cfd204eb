package graft

import graft.functions.{CappedRoster, RosterState}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Direct pins on the [[graft.functions.CappedRoster]] aggregate —
  * the kernel under the mega-class guard. `DedupGuardSpec` proves the
  * guarded QUERIES end-to-end; this spec proves the AGGREGATE's own
  * contract at the level where a regression would actually start:
  *
  *   1. parity with the `collect_list + count + min` trio it fused
  *      (the round-6 plan), under forced partial merges (multi-
  *      partition shuffle → update/serialize/deserialize/merge all
  *      exercised on the real ObjectHashAggregate path);
  *   2. the overflow-marker invariant ClassGuard relies on:
  *      `cls > cap  ⇔  |ids| = cap + 1` — below the cap the roster is
  *      COMPLETE, above it the roster is only a marker (the guard
  *      reads `rep` instead);
  *   3. the documented null contract (ADVICE r8): null ids are
  *      skipped exactly like `collect_list`/`count(col)`/`min(col)`;
  *   4. unit-level update/merge/serde boundaries the DataFrame path
  *      can't target deterministically (buffer growth across the
  *      initial 8-slot array, overflowed-partial adoption, minimum
  *      arriving after the roster stopped growing).
  */
class RosterAggSpec extends SparkSpec {

  // ---- DataFrame-level parity under forced partial merges ----------

  private def fixture(nRows: Int, nKeys: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val rows = (1 to nRows).map { _ =>
      val k = rnd.nextInt(nKeys).toLong
      val id: java.lang.Long =
        if (rnd.nextInt(10) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(1000).toLong)
      Row(k, id)
    } ++ Seq(Row(999L, null), Row(999L, null)) // an all-null group
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("id", LongType, nullable = true)))
    // 7 input partitions: every key spans several map-side partials,
    // so the shuffle carries serialized RosterState buffers and the
    // reduce side merges them — the full TypedImperativeAggregate
    // lifecycle, not just single-partition update+eval.
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 7), schema)
  }

  test("graft_capped_roster == collect_list+count+min across merges, at any cap") {
    val df = fixture(nRows = 600, nKeys = 12, seed = 42L)
    // cap 8: nearly every group overflows; cap 64: mixed; cap 4096
    // (the production ClassGuard cap): nothing overflows.
    for (cap <- Seq(8, 64, 4096)) {
      val got = df.groupBy(col("k"))
        .agg(
          call_function("graft_capped_roster", col("id"), lit(cap)).as("cr"),
          count(col("id")).as("cnt"),
          min(col("id")).as("mn"),
          sort_array(collect_list(col("id"))).as("all"))
        .collect()
      assert(got.length == 13) // 12 random keys + the all-null group
      got.foreach { r =>
        val cr = r.getAs[Row]("cr")
        val (cls, rep) = (cr.getLong(0), cr.getLong(1))
        val ids = cr.getAs[scala.collection.Seq[Long]]("ids")
        val cnt = r.getAs[Long]("cnt")
        val all = r.getAs[scala.collection.Seq[Long]]("all")
        // (1) the fused count: nulls skipped, exact at any cap
        assert(cls == cnt, s"cls=$cls cnt=$cnt cap=$cap k=${r.getLong(0)}")
        // (2) the fused min — defined whenever any non-null id exists
        if (cnt > 0) assert(rep == all.min, s"rep=$rep min=${all.min} cap=$cap")
        else assert(rep == Long.MaxValue && ids.isEmpty,
          s"empty-group state must stay at the createAggregationBuffer identity")
        // (3) below the cap the roster is the COMPLETE multiset
        if (cls <= cap) assert(ids.sorted == all.sorted,
          s"below-cap roster must equal collect_list (cap=$cap, cls=$cls)")
        // (4) the overflow marker, both directions
        assert((cls > cap) == (ids.length == cap + 1),
          s"cls=$cls cap=$cap |ids|=${ids.length}: marker invariant broken")
        // (5) above the cap the marker roster still holds only real
        // members (a subset — never fabricated ids)
        if (cls > cap) {
          val members = all.toSet
          assert(ids.forall(members.contains),
            s"overflowed roster leaked a non-member id (cap=$cap)")
        }
      }
    }
  }

  // ---- unit-level boundaries -----------------------------------------

  private def agg(cap: Int) =
    CappedRoster(BoundReference(0, LongType, nullable = true), cap)

  private def fill(a: CappedRoster, ids: Seq[java.lang.Long]): RosterState =
    ids.foldLeft(a.createAggregationBuffer()) { (s, v) =>
      a.update(s, InternalRow(v))
    }

  private def evalOf(a: CappedRoster, s: RosterState): (Long, Long, Seq[Long]) = {
    val row = a.eval(s).asInstanceOf[InternalRow]
    (row.getLong(0), row.getLong(1), row.getArray(2).toLongArray().toSeq)
  }

  test("update: roster grows past the initial 8-slot array, stops at cap+1") {
    // cap 20 > the 8-slot createAggregationBuffer array: exercises the
    // doubling growth path (8 -> 16 -> min(32, cap+1)=21).
    val a = agg(20)
    val below = fill(a, (1L to 20L).map(java.lang.Long.valueOf))
    assert(evalOf(a, below) == ((20L, 1L, (1L to 20L).toSeq)))
    val over = fill(a, (1L to 23L).map(java.lang.Long.valueOf))
    val (cls, rep, ids) = evalOf(a, over)
    assert(cls == 23L && rep == 1L && ids.length == 21,
      "count keeps counting; roster stops at the cap+1 marker")
  }

  test("update: the minimum is tracked even after the roster stopped growing") {
    val a = agg(3)
    // the class minimum (0) arrives AFTER the roster is already full —
    // rep must still see it even though append() dropped it
    val s = fill(a, Seq(7L, 8L, 9L, 6L, 0L).map(java.lang.Long.valueOf))
    val (cls, rep, ids) = evalOf(a, s)
    assert(cls == 5L && rep == 0L && ids.length == 4)
    assert(!ids.contains(0L), "the late minimum is in rep, not the capped roster")
  }

  test("update: null ids are skipped entirely (cls, rep, roster all unchanged)") {
    val a = agg(5)
    val s = fill(a, Seq[java.lang.Long](null, java.lang.Long.valueOf(4L), null))
    assert(evalOf(a, s) == ((1L, 4L, Seq(4L))))
    val allNull = fill(a, Seq[java.lang.Long](null, null, null))
    assert(evalOf(a, allNull) == ((0L, Long.MaxValue, Seq.empty[Long])))
  }

  test("merge: two below-cap partials whose union overflows flag the marker") {
    val a = agg(5)
    val left = fill(a, (10L to 13L).map(java.lang.Long.valueOf))  // 4 ids
    val right = fill(a, (1L to 4L).map(java.lang.Long.valueOf))   // 4 ids
    val m = a.merge(left, right)
    val (cls, rep, ids) = evalOf(a, m)
    assert(cls == 8L && rep == 1L && ids.length == 6,
      "merged count exact, merged roster truncated at cap+1")
  }

  test("merge: an already-overflowed partial is adopted; order is symmetric on the marker") {
    val a = agg(3)
    def over() = fill(a, (1L to 9L).map(java.lang.Long.valueOf))  // n = cap+1 = 4
    def small() = fill(a, Seq(java.lang.Long.valueOf(100L)))
    val m1 = a.merge(small(), over())
    val (cls1, rep1, ids1) = evalOf(a, m1)
    assert(cls1 == 10L && rep1 == 1L && ids1.length == 4)
    val m2 = a.merge(over(), small())
    val (cls2, rep2, ids2) = evalOf(a, m2)
    assert(cls2 == 10L && rep2 == 1L && ids2.length == 4)
    val empty = a.merge(a.createAggregationBuffer(), over())
    val (cls3, _, ids3) = evalOf(a, empty)
    assert(cls3 == 9L && ids3.length == 4,
      "empty + overflowed adopts the overflowed roster and its marker")
  }

  test("serialize/deserialize roundtrip preserves every field at the boundaries") {
    val a = agg(4)
    for (n <- Seq(0, 1, 4, 5)) { // empty, single, == cap, == cap+1 (marker)
      val s = fill(a, (1L to n.toLong).map(java.lang.Long.valueOf))
      val back = a.deserialize(a.serialize(s))
      assert(back.cls == s.cls && back.rep == s.rep && back.n == s.n)
      assert(back.ids.take(back.n).toSeq == s.ids.take(s.n).toSeq)
      // and the roundtripped state still merges/evals identically
      assert(evalOf(a, back) == evalOf(a, fill(a, (1L to n.toLong).map(java.lang.Long.valueOf))))
    }
  }

  test("registration rejects a non-literal cap with a clear error") {
    val df = fixture(nRows = 20, nKeys = 2, seed = 7L)
    df.createOrReplaceTempView("roster_fixture")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_capped_roster(id, CAST(k AS INT)) FROM roster_fixture GROUP BY k")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"),
      s"expected the literal-cap builder error, got: ${e.getMessage}")
  }
}
