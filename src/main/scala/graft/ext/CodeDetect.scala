package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Code-vs-prose detection — the routing decision an LLM-corpus
  * pipeline makes before tokenization (code and prose want different
  * tokenizers, dedup thresholds, and mixture weights; cf. the
  * code-fraction reporting in open corpus effort write-ups such as
  * The Stack / StarCoder). Heuristic, deliberately cheap: exact counts
  * of code-symbol characters and indented lines, both scale-free
  * permilles, and a flag combining them. Per-doc map work + nothing
  * else — the detector adds zero shuffles to an ingest scan.
  *
  * Exactness contract: symbol counting is `length(text) −
  * length(remove-symbols(text))` with the SAME character class on both
  * engines; line splitting is on bare `\n` (the fixture has no CRLF);
  * permilles are integer-floored.
  */
object CodeDetect {

  /** Code-symbol character class (regex-escaped where needed).
    * POSITIVE class: `regexp_replace(text, SymbolClass, "")` strips the
    * symbol characters, so `length(text) − length(stripped)` counts
    * exactly the symbol characters. (A previous revision negated the
    * class, which inverted the metric — prose scored higher than code;
    * CodeDetectSpec now pins the ordering.)
    */
  private val SymbolClass = """[\[\]{}();=<>#_]"""

  def codeRatio(spark: SparkSession, sfDir: String): DataFrame =
    codeRatioOf(Tables.documents(spark, sfDir))

  /** Frame-level kernel (spec seam: CodeDetectSpec feeds planted
    * prose/code documents and asserts the score ordering). */
  def codeRatioOf(docs: DataFrame): DataFrame =
    docs
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        (length(col("text")) -
          length(regexp_replace(col("text"), SymbolClass, "")))
          .cast("long").as("n_code_chars"),
        expr("size(split(text, '\n'))").cast("long").as("n_lines"),
        expr("size(filter(split(text, '\n'), " +
          "x -> startswith(x, '  ') or startswith(x, '\t')))")
          .cast("long").as("n_indented"))
      .withColumn("code_permille",
        expr("n_code_chars * 1000 div n_chars").cast("long"))
      .withColumn("indent_permille",
        expr("n_indented * 1000 div n_lines").cast("long"))
      .withColumn("looks_like_code",
        col("code_permille") > 30 || col("indent_permille") > 200)

  val codeRatioSql: String =
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(length(text) - length(regexp_replace(text,
       |    '$SymbolClass', '', 'g')) AS BIGINT) AS n_code_chars,
       |  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
       |  CAST(len(list_filter(string_split(text, chr(10)),
       |    x -> starts_with(x, '  ') OR starts_with(x, chr(9))))
       |    AS BIGINT) AS n_indented,
       |  CAST((length(text) - length(regexp_replace(text,
       |    '$SymbolClass', '', 'g'))) * 1000 // length(text) AS BIGINT)
       |    AS code_permille,
       |  CAST(len(list_filter(string_split(text, chr(10)),
       |    x -> starts_with(x, '  ') OR starts_with(x, chr(9)))) * 1000
       |    // len(string_split(text, chr(10))) AS BIGINT)
       |    AS indent_permille,
       |  (length(text) - length(regexp_replace(text, '$SymbolClass', '',
       |    'g'))) * 1000 // length(text) > 30
       |  OR len(list_filter(string_split(text, chr(10)),
       |    x -> starts_with(x, '  ') OR starts_with(x, chr(9)))) * 1000
       |    // len(string_split(text, chr(10))) > 200 AS looks_like_code
       |FROM documents WHERE length(text) > 0""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_code_ratio" -> (codeRatio _))

  val oracles: Map[String, String] = Map(
    "text_code_ratio" -> codeRatioSql)
}
