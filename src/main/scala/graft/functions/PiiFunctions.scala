package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII span detection — the compliance pass every large-scale training
  * corpus runs before export: find (and count) email addresses, phone
  * numbers, IPv4 literals, and payment-card-shaped digit runs, with card
  * candidates VALIDATED by the Luhn checksum (ISO/IEC 7812) so a random
  * 16-digit id doesn't count as a card.
  *
  * All detection is scan-local `regexp_extract_all` + higher-order
  * functions over the match arrays — codegen'd, zero UDFs, zero
  * shuffles: the 100 TB shape is "one pass over the text column".
  * Patterns are RE2-safe (no backtracking constructs) and written so
  * leftmost-greedy (Java) and leftmost-longest (RE2) agree — character
  * classes and bounded greedy quantifiers only, which keeps the DuckDB
  * oracle replay exact.
  *
  * The Luhn fold is pure integer arithmetic over the digit array
  * (reverse → double every second digit → 2d>9 ⇒ 2d−9 → sum mod 10),
  * identical on every engine — no floating point anywhere.
  */
object PiiFunctions {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"
  val ipv4Re =
    "\\b(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])" +
      "(?:\\.(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\\b"
  val cardRe = "\\b[0-9]{13,19}\\b"

  /** Luhn checksum validity of a pure-digit string column: integer HOF
    * fold, codegen'd (`aggregate` over `zip_with`), no UDF. */
  def luhnValid(digits: Column): Column = {
    // slice to length: Java-regex split("") keeps a trailing empty match
    // under Spark's limit=-1, and a null from ''::int would poison the
    // whole fold
    val rev = transform(
      slice(split(reverse(digits), ""), lit(1), length(digits)),
      c => c.cast("int"))
    val weighted = zip_with(rev, sequence(lit(0), length(digits) - 1),
      (d, i) => when(i % 2 === 1,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d))
    aggregate(weighted, lit(0), (acc, x) => acc + x) % 10 === 0
  }

  /** Per-document PII profile: counts per category, Luhn-validated card
    * count, and the aggregate flag. One projection over the scan. */
  def detect(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val cards = regexp_extract_all(text, lit(cardRe), lit(0))
    docs.select(
      col(idCol),
      size(regexp_extract_all(text, lit(emailRe), lit(0)))
        .as("n_email"),
      size(regexp_extract_all(text, lit(phoneRe), lit(0)))
        .as("n_phone"),
      size(regexp_extract_all(text, lit(ipv4Re), lit(0)))
        .as("n_ipv4"),
      size(cards).as("n_card_like"),
      size(filter(cards, luhnValid _)).as("n_card_valid"))
      .withColumn("has_pii",
        col("n_email") + col("n_phone") + col("n_ipv4") +
          col("n_card_valid") > 0)
  }
}
