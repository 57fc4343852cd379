package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Fused top-k-by-score aggregator (SURVEY.md §4 custom candidate (1)).
  *
  * The window form — `row_number over (order by score desc) <= k` — sorts
  * every group in full. This `Aggregator` keeps a bounded min-heap of k
  * entries per group: O(n log k) per partition, merges are heap unions,
  * and partial aggregation means each executor ships at most k rows per
  * group to the exchange — at 1000 executors that's the difference
  * between shuffling the corpus and shuffling k·groups rows.
  *
  * Ties break toward the smaller id (same contract as the window queries'
  * `orderBy(score.desc, id)`).
  */
case class ScoredId(id: Long, score: Double)

class TopKByScore(k: Int) extends Aggregator[ScoredId, mutable.PriorityQueue[ScoredId], Array[ScoredId]] {

  // min-heap on (score, then reversed id): head is the WORST kept entry
  private val worstFirst: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (s.score, -s.id))

  override def zero: mutable.PriorityQueue[ScoredId] =
    mutable.PriorityQueue.empty(worstFirst.reverse)

  private def push(b: mutable.PriorityQueue[ScoredId], s: ScoredId) = {
    if (b.size < k) b.enqueue(s)
    else if (worstFirst.gt(s, b.head)) { b.dequeue(); b.enqueue(s) }
    b
  }

  override def reduce(b: mutable.PriorityQueue[ScoredId], a: ScoredId) = push(b, a)

  override def merge(b1: mutable.PriorityQueue[ScoredId], b2: mutable.PriorityQueue[ScoredId]) =
    b2.foldLeft(b1)(push)

  /** Best-first output: score desc, id asc. */
  override def finish(b: mutable.PriorityQueue[ScoredId]): Array[ScoredId] =
    b.toArray.sorted(worstFirst.reverse)

  override def bufferEncoder: Encoder[mutable.PriorityQueue[ScoredId]] =
    Encoders.kryo[mutable.PriorityQueue[ScoredId]]
  override def outputEncoder: Encoder[Array[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[ScoredId]]()
}

/** [[TopKByScore]] for PAIR-identified candidates (mined (id1, id2)
  * matches): same bounded min-heap / partial-aggregation contract, ties
  * breaking toward the lexicographically smaller (id1, id2) — the same
  * order as the window form's `orderBy(score.desc, id1, id2)`. */
case class ScoredPair(id1: Long, id2: Long, score: Double)

class TopKPairByScore(k: Int) extends Aggregator[ScoredPair, mutable.PriorityQueue[ScoredPair], Array[ScoredPair]] {

  // min-heap on (score, then reversed ids): head is the WORST kept entry
  private val worstFirst: Ordering[ScoredPair] =
    Ordering.by((s: ScoredPair) => (s.score, -s.id1, -s.id2))

  override def zero: mutable.PriorityQueue[ScoredPair] =
    mutable.PriorityQueue.empty(worstFirst.reverse)

  private def push(b: mutable.PriorityQueue[ScoredPair], s: ScoredPair) = {
    if (b.size < k) b.enqueue(s)
    else if (worstFirst.gt(s, b.head)) { b.dequeue(); b.enqueue(s) }
    b
  }

  override def reduce(b: mutable.PriorityQueue[ScoredPair], a: ScoredPair) = push(b, a)

  override def merge(b1: mutable.PriorityQueue[ScoredPair], b2: mutable.PriorityQueue[ScoredPair]) =
    b2.foldLeft(b1)(push)

  /** Best-first output: score desc, (id1, id2) asc. */
  override def finish(b: mutable.PriorityQueue[ScoredPair]): Array[ScoredPair] =
    b.toArray.sorted(worstFirst.reverse)

  override def bufferEncoder: Encoder[mutable.PriorityQueue[ScoredPair]] =
    Encoders.kryo[mutable.PriorityQueue[ScoredPair]]
  override def outputEncoder: Encoder[Array[ScoredPair]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[ScoredPair]]()
}
