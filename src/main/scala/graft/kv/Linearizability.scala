package graft.kv

import scala.collection.immutable.BitSet
import scala.collection.mutable

/** Linearizability checking for concurrent operation histories — the JVM
  * twin of the reference's porcupine checker
  * (`/root/reference/src/porcupine/checker.go`: the Wing & Gong search with
  * memoized (linearized-set, state) configurations) plus the reference's KV
  * model (`/root/reference/src/models/kv.go:17-69`: get observes the
  * current value, put replaces, append concatenates).
  *
  * A history is a set of operations, each with an invocation and a response
  * timestamp; operation A happens-before B iff A returned before B was
  * invoked. The history is linearizable iff some total order exists that
  * (a) extends happens-before and (b) is legal under the sequential model.
  * The checker searches those orders: at each step any un-linearized,
  * happens-before-minimal operation whose observed output the model accepts
  * may come next; visited (chosen-set, state) configurations are memoized
  * so the search never re-explores a failed frontier — porcupine's exact
  * pruning, which turns the factorial search practical for real histories.
  *
  * Like porcupine's `PartitionModel`, a model may split a history into
  * independent sub-histories (the KV model partitions by key: operations on
  * distinct keys commute), which bounds the bitset width by the per-key op
  * count, not the whole history.
  */
object Linearizability {

  /** One completed operation: observed input/output + its real-time
    * invocation/response interval (`invoke < ret`). */
  final case class Operation[I, O](input: I, output: O, invoke: Long, ret: Long)

  /** A sequential specification. */
  trait Model[S, I, O] {
    def init: S

    /** `Some(next)` iff applying `input` in `state` may observe `output`. */
    def step(state: S, input: I, output: O): Option[S]

    /** Split into independent sub-histories (default: none). */
    def partition(ops: Seq[Operation[I, O]]): Seq[Seq[Operation[I, O]]] = Seq(ops)
  }

  /** Is `history` linearizable under `model`? */
  def check[S, I, O](model: Model[S, I, O], history: Seq[Operation[I, O]]): Boolean =
    model.partition(history).forall(sub => checkPartition(model, sub))

  private def checkPartition[S, I, O](model: Model[S, I, O], opsSeq: Seq[Operation[I, O]]): Boolean = {
    val ops = opsSeq.toArray
    val n = ops.length
    if (n == 0) return true
    // visited (linearized-set, state) configurations that failed to extend
    val seen = mutable.HashSet.empty[(BitSet, S)]

    def minimal(done: BitSet, i: Int): Boolean =
      !(0 until n).exists(p => p != i && !done(p) && ops(p).ret < ops(i).invoke)

    def explore(done: BitSet, state: S): Boolean =
      if (done.size == n) true
      else if (!seen.add((done, state))) false
      else (0 until n).exists { i =>
        !done(i) && minimal(done, i) &&
          (model.step(state, ops(i).input, ops(i).output) match {
            case Some(next) => explore(done + i, next)
            case None => false
          })
      }

    explore(BitSet.empty, model.init)
  }
}

/** Inputs of the reference KV model (`/root/reference/src/models/kv.go`):
  * op 0 = get, 1 = put, 2 = append, all keyed. */
sealed trait KvInput { def key: String }
object KvInput {
  final case class Get(key: String) extends KvInput
  final case class Put(key: String, value: String) extends KvInput
  final case class Append(key: String, value: String) extends KvInput
}

/** The reference KV model: state is the key's current value ("" when
  * absent); a get is legal iff it observed exactly the current value; put
  * replaces; append concatenates (`kv.go:40-54`). Partitioned by key, like
  * the lab harness's porcupine configuration — ops on distinct keys
  * commute, so each key checks independently. */
object KvModel extends Linearizability.Model[String, KvInput, String] {
  override def init: String = ""

  override def step(state: String, input: KvInput, output: String): Option[String] =
    input match {
      case KvInput.Get(_) => if (output == state) Some(state) else None
      case KvInput.Put(_, v) => Some(v)
      case KvInput.Append(_, v) => Some(state + v)
    }

  override def partition(ops: Seq[Linearizability.Operation[KvInput, String]])
      : Seq[Seq[Linearizability.Operation[KvInput, String]]] =
    ops.groupBy(_.input.key).values.toSeq
}
