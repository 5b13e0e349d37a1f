package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.WinePipeline

/** End-to-end wine pipeline parity on the synthetic fixture
  * (src/test/resources/wine_sample.json): 12 rows covering malformed
  * points, boundary prices {0, 20, 20.01, 500, 501}, null regions,
  * @handles, and non-allowlisted countries. */
class WinePipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture: String =
    getClass.getResource("/wine_sample.json").getPath

  test("full pipeline: extract -> transform -> validate -> load") {
    val out = Files.createTempDirectory("wine_wh").toString
    val res = WinePipeline.run(spark, fixture, s"$out/wine_data")
    // 12 rows in; 2 drop at dropna(points): the null and the uncoercible.
    assert(res.rowsLoaded == 10)
    val loaded = spark.read.parquet(s"$out/wine_data")
    assert(loaded.count() == 10)

    val byTitle = loaded.collect().map(r =>
      r.getAs[String]("title") -> r).toMap
    // price_category boundaries (pd.cut right-closed)
    assert(byTitle("Zero-priced promotional bottle").getAs[String]("price_category") == null)
    assert(byTitle("Quinta dos Avidagos 2011 Avidagos Red").getAs[String]("price_category") == "cheap")
    assert(byTitle("Boundary 20.01 just over cheap").getAs[String]("price_category") == "affordable")
    assert(byTitle("Premium boundary at five hundred").getAs[String]("price_category") == "premium")
    assert(byTitle("Luxury above five hundred").getAs[String]("price_category") == "luxury")
    // @ stripped; null handle imputed to 'unknown'
    assert(byTitle("Nicosia 2013 Vulka Bianco").getAs[String]("taster_twitter_handle") == "kerinokeefe")
    assert(byTitle("Boundary 20.01 just over cheap").getAs[String]("taster_twitter_handle") == "unknown")
    // region coalesce + unknown fallback
    assert(byTitle("Zero-priced promotional bottle").getAs[String]("region") == "Central Coast")
    assert(byTitle("Both regions null goes unknown").getAs[String]("region") == "unknown")
    // null price was median-imputed (median of 10 non-null prices)
    assert(byTitle("Nicosia 2013 Vulka Bianco").getAs[Double]("price") > 0)
    // country_code: dense codes over sorted distinct countries
    val codes = loaded.select("country", "country_code").distinct().collect()
      .map(r => r.getString(0) -> r.getShort(1)).toMap
    assert(codes.values.toSeq.sorted == codes.values.toSeq.distinct.sorted)
    assert(codes("Argentina") == 0) // first in sorted order of this fixture

    // validation report: non-gating, expected violation counts
    val rep = res.validationReport.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("points_in_range") == 1)   // the 45-point row
    assert(rep("title_str_length") == 1)  // "Hi"
    assert(rep("country_isin") == 2)      // Portugal + Narnia
    assert(rep("price_category_not_null") == 1) // the zero-priced row
  }

  test("CSV-staged compat run equals the fused run (reference 4.1 round-trip)") {
    val out = Files.createTempDirectory("wine_csv").toString
    val fused = WinePipeline.run(spark, fixture, s"$out/fused")
    val staged = WinePipeline.runWithCsvStaging(
      spark, fixture, s"$out/stage_csv", s"$out/staged")
    assert(staged.rowsLoaded == fused.rowsLoaded)
    val a = spark.read.parquet(s"$out/fused")
    val b = spark.read.parquet(s"$out/staged").select(a.columns.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // and the validation reports agree
    val ra = fused.validationReport.collect().map(_.toString).sorted
    val rb = staged.validationReport.collect().map(_.toString).sorted
    assert(ra.sameElements(rb))
  }

  test("append mode duplicates on re-run (reference :199 semantics)") {
    val out = Files.createTempDirectory("wine_wh2").toString
    WinePipeline.run(spark, fixture, s"$out/w", append = true)
    WinePipeline.run(spark, fixture, s"$out/w", append = true)
    assert(spark.read.parquet(s"$out/w").count() == 20)
  }

  test("JDBC warehouse round-trip (embedded Derby): declared DDL types + append/overwrite") {
    // the reference's actual load path (wine_etl_kaggle.py:167-202) run
    // for real against an embedded warehouse: Derby ships with Spark's
    // jars, so the jdbcWrite + createTableColumnTypes path gets runtime
    // evidence without a network Postgres
    graft.sinks.DerbyWarehouse.register()
    val url = "jdbc:derby:memory:winewh;create=true"
    val props = new java.util.Properties()
    def rows = spark.read.jdbc(url, "wine_data", props).count()

    def load(append: Boolean) = WinePipeline.run(spark, fixture,
      warehousePath = "", jdbcUrl = Some(url), append = append)
    val res = load(append = true)
    assert(res.rowsLoaded == 10 && rows == 10)

    // declared column types survived into the warehouse DDL
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getColumns(null, null, "WINE_DATA", null)
      // Spark quotes identifiers, so Derby stores the names lowercase;
      // uppercase for stable assertion keys
      val cols = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => r.getString("COLUMN_NAME").toUpperCase ->
          (r.getString("TYPE_NAME"), r.getInt("COLUMN_SIZE")))
        .toMap
      assert(cols("POINTS")._1 == "INTEGER")
      assert(cols("TITLE") == ("VARCHAR", 255))
      assert(cols("PRICE_CATEGORY") == ("VARCHAR", 50)) // reference :190
      assert(cols("PRICE")._1 == "DOUBLE")
      assert(cols("COUNTRY_CODE")._1 == "SMALLINT")
      // reference Text column (declared STRING): rendered by the dialect
      // as the warehouse's text type — TEXT on Postgres, widest VARCHAR
      // on Derby (see graft.sinks.DerbyVarcharDialect)
      assert(cols("DESCRIPTION") == ("VARCHAR", 32672))
    } finally conn.close()

    // append duplicates on re-run (reference :199); overwrite resets
    load(append = true)
    assert(rows == 20)
    load(append = false)
    assert(rows == 10)
  }

  test("whisky stub yields the declared lot schema, empty without input") {
    val df = WinePipeline.whiskyStub(spark)
    assert(df.schema.fieldNames.toSeq ==
      Seq("lot_id", "title", "current_bid", "auction_url"))
    assert(df.count() == 0)
  }

  test("whisky lot analytics runs on pre-scraped lots") {
    val lots = Files.createTempDirectory("lots").resolve("lots.json")
    Files.writeString(lots,
      """{"lot_id": 1, "title": "Macallan 18", "current_bid": 300.0, "auction_url": "a1"}
        |{"lot_id": 2, "title": "Lagavulin 16", "current_bid": 90.0, "auction_url": "a1"}
        |{"lot_id": 3, "title": "Springbank 10", "current_bid": 120.0, "auction_url": "a2"}
        |""".stripMargin)
    val stats = WinePipeline.whiskyLotStats(
      WinePipeline.whiskyStub(spark, Some(lots.toString)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(stats("a1") == (2L, 390.0 / 2))
    assert(stats("a2") == (1L, 120.0))
  }
}
