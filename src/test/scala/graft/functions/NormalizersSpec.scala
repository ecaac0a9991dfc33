package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NormalizersSpec extends SparkSpec {
  import spark.implicits._

  test("unidecode transliterates Latin diacritics, null-safe") {
    val out = Seq("Čerešňa říčka Señor Müller àéîõü", null).toDF("s")
      .select(Normalizers.unidecode(col("s")).as("u")).collect()
    assert(out(0).getString(0) == "Ceresna ricka Senor Muller aeiou")
    assert(out(1).isNullAt(0))
  }

  test("all 12 mappers present in reference order and compose correctly") {
    assert(Normalizers.orderedNames.size == 12)
    assert(Normalizers.orderedNames.toSet == Normalizers.all.keySet)
    val out = Seq("  ČAsq  ").toDF("s").select(
      Normalizers("noop")(col("s")).as("noop"),
      Normalizers("ci")(col("s")).as("ci"),
      Normalizers("rstrip")(col("s")).as("rstrip"),
      Normalizers("strip")(col("s")).as("strip"),
      Normalizers("unidecode_strip_ci")(col("s")).as("usc")).collect()(0)
    assert(out.getString(0) == "  ČAsq  ")
    assert(out.getString(1) == "  časq  ")
    assert(out.getString(2) == "  ČAsq")
    assert(out.getString(3) == "ČAsq")
    assert(out.getString(4) == "casq")
  }

  test("F5: UTF8_LCASE collation makes distinct case-insensitive without rewriting values") {
    val df = Seq("Apple", "APPLE", "pear").toDF("s")
    val n = df.select(Normalizers.collated(col("s"), "UTF8_LCASE").as("c"))
      .distinct().count()
    assert(n == 2)
  }

  test("unknown mapper errors with known list") {
    val e = intercept[RuntimeException](Normalizers("bogus"))
    assert(e.getMessage.contains("Unknown normalizer"))
  }
}
