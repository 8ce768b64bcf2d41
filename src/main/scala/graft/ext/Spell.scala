package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SymSpell-style spell correction against the corpus vocabulary —
  * the query-understanding front door of the search family (Garbe's
  * symmetric-delete algorithm, public): candidate generation is a
  * pure EQUI-join on 1-character-deletion variants (a query matches a
  * vocab word at edit distance ≤1 iff they share a variant — identity
  * included), so no all-pairs edit-distance scan ever runs; the exact
  * `levenshtein` verify (classic DP, bit-identical in Spark and
  * DuckDB) touches only the collided candidates. Best correction per
  * query = (distance, frequency DESC, word) total order.
  *
  * The gate manufactures its queries deterministically: the 20 most
  * frequent length-≥4 words, each misspelled by dropping its 2nd
  * character — so the machinery must RECOVER the originals (spec
  * asserts it does), and the query set is constant-size at any
  * corpus scale.
  *
  * Scale shape: vocabulary counts are the map-side-combinable token
  * agg every text gate shares; the deletes index fans each vocab word
  * into len+1 variants (Σ|w| rows — the SymSpell trade: index size
  * for join-only lookup) keyed on the variant; queries are a 20-row
  * broadcast fan-out. The verify and top-1 window ride the candidate
  * frame, which is collision-bounded, not vocab-quadratic. */
object Spell {

  val NumQueries = 20

  private def deletesExpr(c: String): String =
    s"array_union(array($c), transform(sequence(1, length($c)), " +
      s"i -> concat(substring($c, 1, i - 1), substring($c, i + 1))))"

  def spellCorrect(spark: SparkSession, sfDir: String): DataFrame = {
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(expr(
        "regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds the query sample AND the deletes index
    val queries = vocab
      .filter(length(col("word")) >= 4)
      .orderBy(col("c").desc, col("word"))
      .limit(NumQueries)
      .select(concat(substring(col("word"), 1, 1),
        expr("substring(word, 3)")).as("query"))
      .distinct() // two originals can collide onto one misspelling
    val vd = vocab.select(col("word"), col("c"),
      explode(expr(deletesExpr("word"))).as("variant"))
    val qd = queries.select(col("query"),
      explode(expr(deletesExpr("query"))).as("variant"))
    val cand = qd.join(vd, "variant")
      .select(col("query"), col("word"), col("c")).distinct()
      .withColumn("dist", levenshtein(col("query"), col("word")).cast("long"))
      .filter(col("dist") <= 1)
    val best = Window.partitionBy(col("query"))
      .orderBy(col("dist"), col("c").desc, col("word"))
    cand.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("query"), col("word").as("correction"), col("dist"),
        col("c").as("freq"))
  }

  val spellCorrectSql: String = {
    def deletesSql(c: String): String =
      s"list_distinct(list_append(list_transform(range(1, len($c) + 1), " +
        s"i -> substr($c, 1, i - 1) || substr($c, CAST(i + 1 AS INTEGER))), $c))"
    s"""WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
       |    AS word FROM documents),
       |vocab AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM toks GROUP BY 1),
       |queries AS (SELECT DISTINCT substr(word, 1, 1) || substr(word, 3)
       |    AS query
       |  FROM (SELECT word FROM vocab WHERE len(word) >= 4
       |        ORDER BY c DESC, word LIMIT $NumQueries)),
       |vd AS (SELECT word, c, unnest(${deletesSql("word")}) AS variant
       |  FROM vocab),
       |qd AS (SELECT query, unnest(${deletesSql("query")}) AS variant
       |  FROM queries),
       |cand AS (SELECT DISTINCT query, word, c
       |  FROM qd JOIN vd USING (variant)),
       |scored AS (SELECT query, word, c,
       |    CAST(levenshtein(query, word) AS BIGINT) AS dist
       |  FROM cand),
       |ranked AS (SELECT query, word, c, dist,
       |    row_number() OVER (PARTITION BY query
       |      ORDER BY dist, c DESC, word) AS rn
       |  FROM scored WHERE dist <= 1)
       |SELECT query, word AS correction, dist, c AS freq
       |FROM ranked WHERE rn = 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "search_spell_correct" -> (spellCorrect _))

  val oracles: Map[String, String] = Map(
    "search_spell_correct" -> spellCorrectSql)
}
