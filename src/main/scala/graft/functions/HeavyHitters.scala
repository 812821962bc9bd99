package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch as a typed `Aggregator` — the
  * streaming-algorithms workhorse Spark has no builtin for (its
  * `approx_count_distinct`/percentile sketches answer different
  * questions). The buffer is a capacity-bounded counter map:
  *
  *  - `reduce`: increment a tracked key; otherwise ADMIT the key and,
  *    only when the buffer reaches 2×capacity, compress once with the
  *    same rule `merge` uses (subtract the (capacity+1)-th largest
  *    count from every counter, drop the non-positive). This is the
  *    batched form of the classic per-row MG decrement: one O(capacity)
  *    compression pays for ≥ capacity admissions, so the per-row cost
  *    is O(1) amortized even on a heavy-tailed corpus where most rows
  *    are untracked — the naive rule rebuilds the whole counter map on
  *    every such row. The bound survives because each compression
  *    destroys ≥ (capacity+1)·cut occurrence mass (at least capacity+1
  *    counters sit at or above the cut), so Σcut ≤ N/(capacity+1) —
  *    the same total undercount the one-at-a-time rule guarantees;
  *  - `merge`: sum counters, then if over capacity subtract the
  *    (capacity+1)-th largest value from every counter and drop the
  *    non-positive ones (Agarwal et al.'s mergeable-summaries rule —
  *    the same guarantee survives arbitrary merge trees, which is
  *    exactly what map-side partial aggregation produces).
  *
  * Guarantee: every item with true frequency > N/(capacity+1) is
  * present in the final buffer, for ANY partitioning and merge order.
  * The candidate SET itself may vary with merge order below that
  * threshold (and may hold up to 2×capacity−1 entries mid-stream) —
  * which is why the exact heavy-hitters query treats it as a candidate
  * generator and re-counts exactly (see
  * [[graft.operators.TextAnalysis.heavyHitters]]); the sketch never
  * decides membership on its own.
  *
  * 100 TB shape: the corpus shuffles ONE bounded map per partition
  * (≤ capacity entries), never rows — the whole point vs a full
  * groupBy whose shuffle is vocabulary-sized.
  */
class MisraGries(capacity: Int)
  extends Aggregator[String, Map[String, Long], Array[String]] {
  require(capacity > 0, "MisraGries capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] = {
    val grown = b.updated(tok, b.getOrElse(tok, 0L) + 1L)
    if (grown.size < 2 * capacity) grown else compress(grown)
  }

  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] = {
    val s = b.foldLeft(a) { case (m, (k, v)) =>
      m.updated(k, m.getOrElse(k, 0L) + v)
    }
    if (s.size <= capacity) s else compress(s)
  }

  /** Subtract the (capacity+1)-th largest count from everything; at
    * most `capacity` strictly-larger counters can survive. */
  private def compress(s: Map[String, Long]): Map[String, Long] = {
    val cut = s.values.toIndexedSeq
      .sorted(Ordering[Long].reverse).apply(capacity)
    s.collect { case (k, v) if v > cut => k -> (v - cut) }
  }

  /** Sorted for a deterministic array given a buffer; the downstream
    * exact re-count makes the QUERY deterministic regardless. A buffer
    * still over capacity (possible when no final merge ran — the
    * batched `reduce` admits up to 2×capacity−1) is compressed here,
    * so the emitted candidate set is ≤ capacity BY CONSTRUCTION of the
    * sketch, not by courtesy of Spark's partial+final aggregation
    * always inserting a merge step. */
  override def finish(b: Map[String, Long]): Array[String] =
    (if (b.size <= capacity) b else compress(b)).keys.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Array[String]] =
    ExpressionEncoder()
}
