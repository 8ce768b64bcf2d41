package graft

import scala.util.Random

import graft.kv.Linearizability
import graft.kv.Linearizability.{Append, Get, Op, Put}

/** The checker itself, exercised the way the reference's harness uses
  * Porcupine (`/root/reference/src/kvraft/test_test.go:131-388`):
  * histories from concurrent clients against a correct store must pass;
  * known-broken histories (stale reads, lost appends, ordering
  * violations) must fail. */
class LinearizabilitySpec extends SparkSpec {

  test("hand cases: sequential history is linearizable") {
    val h = Seq(
      Op(0, Put, "k", "a", "", 0, 1),
      Op(0, Append, "k", "b", "", 2, 3),
      Op(0, Get, "k", "", "ab", 4, 5))
    assert(Linearizability.check(h))
  }

  test("hand cases: stale read is NOT linearizable") {
    val h = Seq(
      Op(0, Put, "k", "a", "", 0, 1),
      Op(0, Get, "k", "", "", 2, 3)) // reads pre-put state after it returned
    assert(!Linearizability.check(h))
  }

  test("hand cases: concurrent ops may linearize in either order") {
    // put(a) and put(b) overlap; a get after both may see either value.
    val base = Seq(
      Op(0, Put, "k", "a", "", 0, 10),
      Op(1, Put, "k", "b", "", 0, 10))
    assert(Linearizability.check(base :+ Op(2, Get, "k", "", "a", 11, 12)))
    assert(Linearizability.check(base :+ Op(2, Get, "k", "", "b", 11, 12)))
    assert(!Linearizability.check(base :+ Op(2, Get, "k", "", "c", 11, 12)))
  }

  test("hand cases: lost append is NOT linearizable") {
    val h = Seq(
      Op(0, Append, "k", "x", "", 0, 1),
      Op(1, Append, "k", "y", "", 2, 3),
      Op(2, Get, "k", "", "y", 4, 5)) // x vanished
    assert(!Linearizability.check(h))
  }

  test("histories from a correct concurrent store always pass") {
    // Simulated linearizable store: a lock around a map; each op's
    // linearization point is inside its [invoke, ret] window by
    // construction (the reference generates histories the same way,
    // from real concurrent clerks against the lab implementation).
    val rnd = new Random(13)
    for (trial <- 1 to 10) {
      val store = collection.mutable.Map.empty[String, String]
      var clock = 0L
      val history = collection.mutable.ArrayBuffer.empty[Op]
      val lock = new Object
      val threads = (0 until 4).map { client =>
        new Thread(() => {
          val r = new Random(trial * 100 + client)
          for (_ <- 1 to 12) {
            val key = s"k${r.nextInt(2)}"
            val kind = r.nextInt(3) match {
              case 0 => Get; case 1 => Put; case 2 => Append
            }
            val arg = if (kind == Get) "" else s"${client}x"
            lock.synchronized {
              val invoke = clock; clock += 1
              val result = kind match {
                case Get => store.getOrElse(key, "")
                case Put => store(key) = arg; ""
                case Append =>
                  store(key) = store.getOrElse(key, "") + arg; ""
              }
              val ret = clock; clock += 1
              history += Op(client, kind, key, arg, result, invoke, ret)
            }
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(Linearizability.check(history.toSeq), s"trial $trial")
    }
  }

  test("kv_replay final states are a valid linearization of the op log") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val s = spark
    // Seq-ordered replay IS a linearization witness: render the op log as
    // a sequential history, append the replayed final state as one Get
    // per key — the checker must accept it, and must reject a corruption.
    val opsDf = graft.kv.KvReplay.opsFromEvents(Tables.events(spark, sf))
      .filter(col("op") =!= "get").orderBy(col("seq")).limit(300)
    val ops = opsDf.as[(Long, String, String, String)].collect()
    val finals = graft.kv.KvReplay.replay(opsDf)
      .as[(String, String)].collect().toMap
    val base = ops.zipWithIndex.map { case ((_, key, op, v), i) =>
      Op(0, if (op == "put") Put else Append, key, v, "", 2L * i, 2L * i + 1)
    }.toSeq
    val t0 = 2L * ops.length
    val gets = finals.toSeq.zipWithIndex.map { case ((k, v), i) =>
      Op(1, Get, k, "", v, t0 + 2 * i, t0 + 2 * i + 1)
    }
    assert(Linearizability.check(base ++ gets))
    val bad = gets.head.copy(result = gets.head.result + "CORRUPT")
    assert(!Linearizability.check(base :+ bad))
  }
}
