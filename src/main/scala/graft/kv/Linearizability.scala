package graft.kv

/** Linearizability checking for the reference's [SPEC] string-KV model —
  * the role Porcupine plays in its test harness
  * (`/root/reference/src/porcupine/checker.go`, model at
  * `src/models/kv.go:17-54`, wired in `src/kvraft/test_test.go:369-385`).
  *
  * Model (kv.go semantics): per-key state is one string; get returns the
  * current state ("" if absent), put replaces it, append concatenates.
  * Like the reference, the history is partitioned per key first
  * (`src/models/kv.go:21-29`) — operations on different keys commute, so
  * each key checks independently and the search space stays tractable.
  *
  * Algorithm: Wing & Gong-style DFS over operation orderings with a
  * memoized (linearized-set, state) cache — the same shape as
  * Porcupine's iterative checker (`checker.go`). An op may linearize
  * next iff every op that RETURNED before this op was INVOKED has
  * already been linearized (real-time order), and its observed result
  * matches the model transition.
  *
  * This is driver-side test machinery (histories are per-key and small),
  * not a distributed operator — exactly as in the reference, where the
  * checker runs inside the test process.
  */
object Linearizability {

  sealed trait OpKind
  case object Get extends OpKind
  case object Put extends OpKind
  case object Append extends OpKind

  /** One completed client operation with real-time invoke/return stamps. */
  case class Op(client: Int, kind: OpKind, key: String, arg: String,
      result: String, invoke: Long, ret: Long)

  /** Check a whole history: partition per key, check each independently. */
  def check(history: Seq[Op]): Boolean =
    history.groupBy(_.key).forall { case (_, ops) => checkKey(ops) }

  /** DFS with memoization over (chosen-set, state). */
  private def checkKey(ops: Seq[Op]): Boolean = {
    val arr = ops.toArray
    val n = arr.length
    if (n > 62) throw new IllegalArgumentException(
      s"per-key history too long for bitmask search: $n")
    val seen = collection.mutable.HashSet.empty[(Long, String)]

    def step(state: String, op: Op): Option[String] = op.kind match {
      case Get => if (op.result == state) Some(state) else None
      case Put => Some(op.arg)
      case Append => Some(state + op.arg)
    }

    def dfs(chosen: Long, state: String): Boolean = {
      if (java.lang.Long.bitCount(chosen) == n) return true
      if (!seen.add((chosen, state))) return false
      var i = 0
      while (i < n) {
        if ((chosen & (1L << i)) == 0) {
          val op = arr(i)
          // Real-time constraint: all ops that returned before op.invoke
          // must already be linearized.
          var ok = true
          var j = 0
          while (ok && j < n) {
            if ((chosen & (1L << j)) == 0 && j != i &&
              arr(j).ret < op.invoke) ok = false
            j += 1
          }
          if (ok) step(state, op) match {
            case Some(next) => if (dfs(chosen | (1L << i), next)) return true
            case None => ()
          }
        }
        i += 1
      }
      false
    }
    dfs(0L, "")
  }
}
