package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** The text-analysis classifier family on constructed inputs: language ID
  * with known-language sentences, the documented tie-break, and bounds of
  * the quality/ratio features. */
class LangIdSpec extends SparkTestBase {

  import spark.implicits._

  private def idOf(text: String): String =
    Seq(text).toDF("text")
      .select(TextAnalysis.langId(col("text")).as("lang"))
      .head().getString(0)

  test("marker-word sentences classify to their language") {
    assert(idOf("the cat sat on the mat and it is warm") === "en")
    assert(idOf("el perro corre en la calle y se va por un camino") === "es")
    assert(idOf("der Hund und die Katze das ist von den nicht ein") === "de")
    assert(idOf("le chat est dans la maison et les oiseaux sont dans une cage") === "fr")
    assert(idOf("我 是 在 这 中 和 他 有 了 的") === "zh")
  }

  test("no marker hits → und") {
    assert(idOf("") === "und")
    assert(idOf("zzz qqq xxx yyy") === "und")
  }

  test("ties break toward the lowest language code") {
    // 'the' hits only the en profile, 'el' only es: equal scores → en.
    assert(idOf("the el") === "en")
  }

  test("quality score and ratios stay in [0,1]") {
    val stats = Seq(
      "A normal english sentence with the usual words in it for quality.",
      "1234567890 !!!! ????", "", "ALLCAPS SHOUTING TEXT")
      .toDF("text")
      .select(
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.digitRatio(col("text")).as("d"),
        TextAnalysis.punctRatio(col("text")).as("p"),
        TextAnalysis.stopwordRatio(col("text")).as("s"))
    val bad = stats.filter(
      col("q") < 0 || col("q") > 1 || col("d") < 0 || col("d") > 1 ||
        col("p") < 0 || col("p") > 1 || col("s") < 0 || col("s") > 1).count()
    assert(bad === 0L)
    // the clean English sentence must outscore the digit/punct garbage
    val rows = stats.select("q").collect().map(_.getDouble(0))
    assert(rows(0) > rows(1))
  }

  test("token counting: whitespace runs collapse, blanks count zero") {
    val counts = Seq("one  two\tthree\nfour", "", "   ", "single")
      .toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(counts === Seq(4, 0, 0, 1))
  }

  test("subword estimate splits case/digit/punct transitions") {
    val n = Seq("camelCase v2.0").toDF("text")
      .select(TextAnalysis.subwordCountEstimate(col("text")).as("n"))
      .head().getInt(0)
    // camel|Case, v|2, and a split BEFORE the punct: camel,Case,v,2,".0"
    assert(n === 5)
  }
}
