package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String-normalization mappers used by distinct-counting and categorical
  * value-set guessing — the reference's 12 composed "series mappers"
  * (reference: db_transformer/db/distinct_cnt_retrieval.py:55-115).
  *
  * All are pure Catalyst `Column` expressions (codegen'd, no UDFs):
  * `lower`/`trim`/`rtrim` are builtins; `unidecode` is a `translate` over a
  * diacritic table (ASCII transliteration approximating the reference's
  * `unidecode` library, distinct_cnt_retrieval.py:73-80 — exact for the
  * Latin-1/Latin-Extended-A range, which covers the CTU datasets' content).
  */
object Normalizers {

  private val accented =
    "ÀÁÂÃÄÅàáâãäåÇçÈÉÊËèéêëÌÍÎÏìíîïÑñÒÓÔÕÖØòóôõöøÙÚÛÜùúûüÝÿýŠšŽžČčĆćĐđŘřŮůŇňŤťĚěĎďĹĺĽľŔŕÃãÕõĀāĒēĪīŌōŪūĂăĘęĮįŲųŐőŰűŁłŚśŹźŻż"
  private val plain =
    "AAAAAAaaaaaaCcEEEEeeeeIIIIiiiiNnOOOOOOooooooUUUUuuuuYyySsZzCcCcDdRrUuNnTtEeDdLlLlRrAaOoAaEeIiOoUuAaEeIiUuOoUuLlSsZzZz"

  /** ASCII transliteration (F3). Null-safe like the reference's
    * `series.map(unidecode, na_action="ignore")`. */
  def unidecode(c: Column): Column = translate(c, accented, plain)

  /** The 12 named mappers (F4) keyed exactly as the reference's
    * `SIMPLE_STRING_SERIES_MAPPERS` enum so configs carry over. */
  val all: Map[String, Column => Column] = Map(
    "noop"                -> identity[Column] _,
    "ci"                  -> ((c: Column) => lower(c)),
    "rstrip"              -> ((c: Column) => rtrim(c)),
    "strip"               -> ((c: Column) => trim(c)),
    "unidecode"           -> (unidecode _),
    "rstrip_ci"           -> ((c: Column) => lower(rtrim(c))),
    "strip_ci"            -> ((c: Column) => lower(trim(c))),
    "unidecode_ci"        -> ((c: Column) => unidecode(lower(c))),
    "unidecode_rstrip"    -> ((c: Column) => unidecode(rtrim(c))),
    "unidecode_strip"     -> ((c: Column) => unidecode(trim(c))),
    "unidecode_rstrip_ci" -> ((c: Column) => unidecode(lower(rtrim(c)))),
    "unidecode_strip_ci"  -> ((c: Column) => unidecode(lower(trim(c)))))

  /** Mapper trial order used by the categorical value-set guesser
    * (reference: data/converter/column/cat_converter.py:44-78 tries the
    * mappers in declaration order until one's distinct count matches the
    * declared cardinality). */
  val orderedNames: Seq[String] = Seq(
    "noop", "ci", "rstrip", "strip", "unidecode", "rstrip_ci", "strip_ci",
    "unidecode_ci", "unidecode_rstrip", "unidecode_strip",
    "unidecode_rstrip_ci", "unidecode_strip_ci")

  def apply(name: String): Column => Column =
    all.getOrElse(name, sys.error(s"Unknown normalizer '$name'; known: ${orderedNames.mkString(", ")}"))

  /** F5: COLLATE forcing (distinct_cnt_retrieval.py:43-46) — Spark 4 has
    * first-class collations; `collate(c, "UTF8_LCASE")` makes comparisons /
    * distinct case-insensitive without rewriting values (the ci mapper is
    * the value-rewriting emulation). */
  def collated(c: Column, collation: String): Column = collate(c, collation)
}
