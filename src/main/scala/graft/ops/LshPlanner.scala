package graft.ops

/** MinHash-LSH parameter derivation from a target Jaccard threshold —
  * the public S-curve analysis (Leskovec/Rajaraman/Ullman, "Mining of
  * Massive Datasets", ch. 3.4): with `b` bands of `r` rows, a pair
  * with Jaccard similarity `s` shares at least one band key with
  * probability 1 − (1 − s^r)^b, an S-curve whose inflection
  * ("threshold") sits at approximately (1/b)^(1/r).
  *
  * Round 3 shipped (4 bands × 2 rows, 8 hashes) as unexplained
  * constants; this makes the trade derivable — a user states the
  * Jaccard level at which pairs should start surfacing and the
  * planner picks (bands, rows) under a signature-width budget. The
  * registry default is exactly `plan(0.5, 8) == (4, 2)`, so existing
  * oracle results are unchanged (PropertySpec pins this).
  *
  * Scale note: bands × rows is the signature width — row-local state
  * per doc — and `bands` multiplies the rows entering the band
  * self-join. Raising `rows` (steeper curve, fewer false candidates)
  * is cheap; raising `bands` (higher recall near the threshold) is
  * what grows candidate volume. The planner only navigates the curve;
  * the cost model stays the caller's.
  */
object LshPlanner {
  /** The similarity at the S-curve inflection for (bands, rows):
    * (1/b)^(1/r). Pairs above it are more likely than not to collide. */
  def sCurveThreshold(bands: Int, rows: Int): Double = {
    require(bands >= 1 && rows >= 1, s"need bands,rows >= 1, got ($bands,$rows)")
    math.pow(1.0 / bands, 1.0 / rows)
  }

  /** P(some band collides) for a pair at Jaccard `s`: 1 − (1 − s^r)^b. */
  def collisionProbability(s: Double, bands: Int, rows: Int): Double = {
    require(s >= 0 && s <= 1, s"similarity must be in [0,1], got $s")
    1.0 - math.pow(1.0 - math.pow(s, rows), bands)
  }

  /** Choose (bands, rows) with bands·rows ≤ hashBudget whose S-curve
    * threshold is closest to `target`. Ties prefer the wider signature
    * (more hashes = lower estimator variance), then more rows per band
    * (steeper curve = fewer sub-threshold candidates) — both are the
    * conservative choice for dedup precision. */
  def plan(target: Double, hashBudget: Int): (Int, Int) = {
    require(target > 0 && target < 1, s"target must be in (0,1), got $target")
    require(hashBudget >= 1, s"hashBudget must be >= 1, got $hashBudget")
    val candidates = for {
      r <- 1 to hashBudget
      b <- 1 to hashBudget / r
    } yield (b, r)
    candidates.minBy { case (b, r) =>
      (math.abs(sCurveThreshold(b, r) - target), -b * r, -r)
    }
  }
}
