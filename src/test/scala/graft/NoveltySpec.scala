package graft

import graft.ext.Novelty

/** Pins first-occurrence n-gram novelty on hand corpora. */
class NoveltySpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] =
    Novelty.noveltyOf(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("verbatim repeat scores zero; first sighting scores full") {
    val a = "alpha beta gamma delta epsilon zeta"
    val got = run(Seq((1L, a), (2L, a), (3L, "nothing shared here at all")))
    // Doc 1: 4 distinct 3-shingles, all first sightings.
    assert(got(1L) == ((4L, 4L, 1000L)), got.toString)
    // Doc 2 repeats doc 1 verbatim: zero novelty.
    assert(got(2L) == ((4L, 0L, 0L)))
    // Doc 3 shares nothing: full novelty.
    assert(got(3L)._2 == got(3L)._1 && got(3L)._3 == 1000L)
  }

  test("partial overlap: only the shared run is non-novel") {
    // Doc 2 = new prefix + doc 1's middle + new suffix. Shingles fully
    // inside the copied run are old; boundary-crossing ones are new.
    val got = run(Seq(
      (1L, "one two three four five six"),
      (2L, "fresh start one two three four five six brand new end")))
    val (n2, novel2, pm2) = got(2L)
    assert(n2 > novel2 && novel2 > 0, got.toString)
    assert(pm2 == novel2 * 1000 / n2)
    // Exactly the 4 shingles of the copied 6-word run are non-novel.
    assert(n2 - novel2 == 4)
  }

  test("short docs (< k words) emit no row; ties go to the smaller doc_id") {
    val got = run(Seq(
      (5L, "tiny doc"),
      (7L, "same same same phrase here"),
      (6L, "same same same phrase here")))
    assert(!got.contains(5L))
    // doc 6 < doc 7 ⇒ 6 is the first sighting despite input order.
    assert(got(6L)._3 == 1000L && got(7L)._3 == 0L)
  }
}
