package graft

import org.apache.spark.TaskContext
import org.scalacheck.Gen

import graft.engine.{KV, MapReduce}

/** The generic runJob façade vs a 20-line sequential oracle — the port of
  * the reference's mrsequential-vs-distributed differential harness
  * (`/root/reference/src/main/mrsequential.go:59-84`,
  * `src/main/test-mr.sh:78-144`). */
class MapReduceSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential semantics spec: sort by key, group runs, reduce. */
  private def sequential(input: Seq[KV], mapF: MapReduce.MapF,
      reduceF: MapReduce.ReduceF): Map[String, String] = {
    val inter = input.flatMap(kv => mapF(kv.key, kv.value)).sortBy(_.key)
    inter.groupBy(_.key).map { case (k, kvs) =>
      k -> reduceF(k, kvs.map(_.value))
    }
  }

  private lazy val corpus: Seq[KV] =
    Tables.documents(spark, sf).select($"source", $"text")
      .as[(String, String)].collect().toSeq
      .groupBy(_._1).view
      .mapValues(_.map(_._2).mkString("\n")).toSeq
      .map { case (f, txt) => KV(f, txt) } // one "file" per source

  private def run(input: Seq[KV], mapF: MapReduce.MapF,
      reduceF: MapReduce.ReduceF): Map[String, String] =
    MapReduce.runJob(input.toDS(), mapF, reduceF)
      .collect().map(kv => kv.key -> kv.value).toMap

  test("wc app through the façade matches sequential oracle") {
    assert(run(corpus, MapReduce.wcMap, MapReduce.wcReduce) ==
      sequential(corpus, MapReduce.wcMap, MapReduce.wcReduce))
  }

  test("indexer app through the façade matches sequential oracle") {
    assert(run(corpus, MapReduce.indexerMap, MapReduce.indexerReduce) ==
      sequential(corpus, MapReduce.indexerMap, MapReduce.indexerReduce))
  }

  test("non-monoid reduce (sorted concat) is order-insensitive") {
    val crashMap: MapReduce.MapF = (file, contents) => Seq(
      KV("a", file), KV("b", contents.length.toString),
      KV("c", contents.length.toString), KV("d", "xyzzy"))
    assert(run(corpus, crashMap, MapReduce.sortedJoinReduce) ==
      sequential(corpus, crashMap, MapReduce.sortedJoinReduce))
  }

  test("property: arbitrary KV bags match the sequential oracle") {
    val kvGen = for {
      k <- Gen.oneOf("k1", "k2", "k3", "k4", "k5")
      v <- Gen.alphaNumStr.map(_.take(8))
    } yield KV(k, v)
    for (_ <- 1 to 5) {
      val bag = Gen.listOfN(200, kvGen).sample.get
      val identityMap: MapReduce.MapF = (k, v) => Seq(KV(k, v))
      assert(run(bag, identityMap, MapReduce.sortedJoinReduce) ==
        sequential(bag, identityMap, MapReduce.sortedJoinReduce))
    }
  }

  test("chaos: output equals failure-free run under injected task failure") {
    // Spark analog of test-mr.sh's crash test (§5.3.3): fail each map
    // task's first attempt in one partition; task retry must reproduce
    // the failure-free result (C2/C5 semantics).
    val clean = run(corpus, MapReduce.wcMap, MapReduce.wcReduce)
    val chaotic = MapReduce.runJob(
      corpus.toDS().repartition(4).mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc != null && tc.partitionId() == 1 && tc.attemptNumber() == 0)
          throw new RuntimeException("injected chaos: first attempt dies")
        it
      },
      MapReduce.wcMap, MapReduce.wcReduce)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(chaotic == clean)
  }

  test("sorted text sink writes 'key value' lines, key-sorted per partition") {
    val dir = java.nio.file.Files.createTempDirectory("mr-sink").toString
    val result = MapReduce.runJob(corpus.toDS(), MapReduce.wcMap, MapReduce.wcReduce)
    MapReduce.sortedTextSink(result, dir)
    val lines = spark.read.textFile(dir).collect()
    val want = sequential(corpus, MapReduce.wcMap, MapReduce.wcReduce)
    assert(lines.length == want.size)
    assert(lines.map(_.split(" ", 2)).forall { case Array(k, v) => want(k) == v })
  }

  test("MrRun app registry matches the reference's plugin apps") {
    import graft.apps.MrRun
    assert(MrRun.apps.keySet == Set("wc", "indexer", "catenate"))
    // Each registered app runs through the façade and matches the
    // sequential oracle on the corpus.
    for ((name, (mapF, reduceF)) <- MrRun.apps) {
      assert(run(corpus, mapF, reduceF) == sequential(corpus, mapF, reduceF),
        s"app $name")
    }
  }

  test("wholeFiles reads (filename, contents) one row per file") {
    val dir = java.nio.file.Files.createTempDirectory("mr-files")
    val f1 = dir.resolve("a.txt"); val f2 = dir.resolve("b.txt")
    java.nio.file.Files.writeString(f1, "hello world\nhello")
    java.nio.file.Files.writeString(f2, "spark")
    val rows = MapReduce.wholeFiles(spark, Seq(dir.toString + "/*.txt"))
      .collect().map(kv => kv.key.split("/").last -> kv.value).toMap
    assert(rows == Map("a.txt" -> "hello world\nhello", "b.txt" -> "spark"))
  }
}
