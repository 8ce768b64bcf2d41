package graft

import org.apache.spark.sql.functions._

import graft.engine.MapReduce

/** The DataSource V2 whole-file source: parity with wholeTextFiles, one
  * partition per file (the reference's nMap = #files), and real column
  * pruning (path-only reads never touch file bytes). */
class WholeFileSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("wholefile-src")
    java.nio.file.Files.writeString(d.resolve("a.txt"), "hello world\nhello")
    java.nio.file.Files.writeString(d.resolve("b.txt"), "spark engine")
    java.nio.file.Files.writeString(d.resolve("c.txt"), "")
    d.toString
  }

  test("reads (path, content, length), one row per file") {
    val rows = spark.read.format("wholefile").load(dir)
      .select(col("path"), col("content"), col("length"))
      .as[(String, String, Long)].collect()
      .map { case (p, c, l) => (p.split("/").last, c, l) }.sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("a.txt", "hello world\nhello", 17L),
      ("b.txt", "spark engine", 12L),
      ("c.txt", "", 0L)))
  }

  test("one input partition per file — the reference's map granularity") {
    val df = spark.read.format("wholefile").load(dir)
    assert(df.rdd.getNumPartitions == 3)
  }

  test("column pruning reaches the source: path-only scan skips bytes") {
    val df = spark.read.format("wholefile").load(dir).select("path")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("columns=path"), scan)
    assert(df.count() == 3)
  }

  test("nonexistent path / zero-match glob fail like built-in sources") {
    intercept[Exception] {
      spark.read.format("wholefile").load("/no/such/dir-xyz").collect()
    }
    intercept[Exception] {
      spark.read.format("wholefile").load(s"$dir/*.nope").collect()
    }
  }

  test("remote URI schemes are rejected with the local-only contract") {
    for (bad <- Seq("hdfs://nn:8020/data", "s3a://bucket/prefix",
        "hdfs:/user/corpus")) {
      val e = intercept[Exception] {
        spark.read.format("wholefile").load(bad).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("local-filesystem")), msgs(e).mkString(" | "))
    }
    // file: prefix stays accepted.
    assert(spark.read.format("wholefile").load(s"file:$dir").count() == 3)
  }

  test("source matches the wholeFiles engine path on the same corpus") {
    val viaSource = spark.read.format("wholefile").load(dir)
      .select(col("path"), col("content"))
      .as[(String, String)].collect()
      .map { case (p, c) => p.split("/").last -> c }.toMap
    val viaEngine = MapReduce.wholeFiles(spark, Seq(s"$dir/*.txt"))
      .collect().map(kv => kv.key.split("/").last -> kv.value).toMap
    // wholetext text source drops empty files; the DSv2 source keeps them.
    assert(viaSource.filter(_._2.nonEmpty) == viaEngine.filter(_._2.nonEmpty))
  }

  test("wordcount over the source equals the corpus oracle") {
    val got = spark.read.format("wholefile").load(dir)
      .select(engine.Tokenizer.words(col("content")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    assert(got == Map("hello" -> 2L, "world" -> 1L, "spark" -> 1L,
      "engine" -> 1L))
  }
}
