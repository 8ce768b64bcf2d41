package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization matching the reference's map-side split semantics:
  * split contents on every run of non-letter characters and drop empty
  * tokens (reference: `strings.FieldsFunc(contents, !unicode.IsLetter)`,
  * `src/mrapps/wc.go:22-35`).
  *
  * Two flavors:
  *  - `UnicodePattern` (`[^\p{L}]+`) is the faithful `unicode.IsLetter`
  *    rendition;
  *  - `AsciiPattern` (`[^a-zA-Z]+`) is the DuckDB-oracle-comparable
  *    subset (FIXTURES.md pins the oracle corpus to ASCII; Java and RE2
  *    Unicode tables can disagree, `SURVEY.md §7.7`).
  *
  * Everything stays inside Catalyst built-ins (split / filter HOF), so the
  * tokenizer is whole-stage-codegen'd — no Scala UDF in the hot path.
  */
object Tokenizer {
  val AsciiPattern = "[^a-zA-Z]+"
  val UnicodePattern = "[^\\p{L}]+"

  /** Array of non-empty tokens (pre-explode, so the empty-token drop
    * happens before the generator fans rows out). */
  def tokens(text: Column, pattern: String = AsciiPattern): Column =
    filter(split(text, pattern), t => length(t) > lit(0))

  /** One row per token. */
  def words(text: Column, pattern: String = AsciiPattern): Column =
    explode(tokens(text, pattern))
}
