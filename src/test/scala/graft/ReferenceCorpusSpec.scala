package graft

import java.io.File

import graft.engine.{KV, MapReduce}

/** Differential parity on the reference's OWN test corpus — the eight
  * Project Gutenberg texts every test-mr.sh run uses
  * (`/root/reference/src/main/pg-*.txt`, read-only; corpus facts pinned
  * in BASELINE.md): distributed runJob output must equal the sequential
  * oracle, exactly as `test-mr.sh:78-144` compares mrsequential against
  * the coordinator/worker run. */
class ReferenceCorpusSpec extends SparkSpec {

  private val corpusDir = "/root/reference/src/main"
  private lazy val files: Seq[String] =
    Option(new File(corpusDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("pg-.*\\.txt")).map(_.getPath).sorted.toSeq

  private lazy val corpus: Seq[KV] =
    files.map(p => KV(p, new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      "UTF-8")))

  private def sequential(mapF: MapReduce.MapF,
      reduceF: MapReduce.ReduceF): Map[String, String] =
    corpus.flatMap(kv => mapF(kv.key, kv.value)).sortBy(_.key)
      .groupBy(_.key).map { case (k, kvs) => k -> reduceF(k, kvs.map(_.value)) }

  test("corpus shape matches BASELINE.md: 8 files, 3,301,104 bytes") {
    assume(files.nonEmpty, "reference corpus not present")
    assert(files.size == 8)
    assert(files.map(new File(_).length()).sum == 3301104L)
  }

  test("distributed wordcount on the real corpus == sequential oracle") {
    assume(files.nonEmpty)
    val got = MapReduce.runJobOnFiles(spark, files,
      MapReduce.wcMap, MapReduce.wcReduce)
      .collect().map(kv => kv.key -> kv.value).toMap
    // wholeFiles keys are file:// URIs; normalize to paths for compare.
    val want = sequential(MapReduce.wcMap, MapReduce.wcReduce)
    assert(got.size == want.size)
    val wantTotal = want.valuesIterator.map(_.toLong).sum
    assert(got.valuesIterator.map(_.toLong).sum == wantTotal)
    assert(got == want || got.map { case (k, v) =>
      k.stripPrefix("file:").replaceAll("^/+", "/") -> v } == want)
  }

  test("distributed indexer on the real corpus == sequential oracle") {
    assume(files.nonEmpty)
    // Compare with filename-normalized map functions so the URI prefix of
    // input_file-style keys cannot mask a real mismatch.
    val mapF: MapReduce.MapF = (file, contents) =>
      MapReduce.indexerMap(new File(file.stripPrefix("file:")).getName, contents)
    val got = MapReduce.runJobOnFiles(spark, files, mapF,
      MapReduce.indexerReduce)
      .collect().map(kv => kv.key -> kv.value).toMap
    val want = corpus.map(kv => KV(new File(kv.key).getName, kv.value))
      .flatMap(kv => MapReduce.indexerMap(kv.key, kv.value)).sortBy(_.key)
      .groupBy(_.key)
      .map { case (k, kvs) => k -> MapReduce.indexerReduce(k, kvs.map(_.value)) }
    assert(got == want)
  }
}
