package graft

import graft.engine.{Bronze, GoldDims, Silver}
import org.apache.spark.sql.functions._

/** Silver/gold cleaners validated against the REAL Olist CSVs shipped with the
  * reference (`/root/reference/data/`) — the inference and null-handling edge
  * cases 1-2-row synthetic fixtures can't reach (VERDICT round-1 item 5).
  * Reference behavior under test: `transformation.py:103-120`,
  * `reporting.py:142-172`. */
class RealDataSpec extends SparkSuite {

  private val dataDir = "/root/reference/data"

  test("real products CSV: row counts, null-category handling, weight bands, volume") {
    val bronze = Bronze.readCsv(spark, s"$dataDir/olist_products_dataset.csv", "products")
    assert(bronze.count() == 32951)

    val silver = Silver.cleanProducts(bronze).cache()
    assert(silver.count() == 32951, "projection-only clean keeps every row")

    // 610 products have no category; initcap(regexp_replace(NULL)) stays NULL
    assert(silver.filter(col("Prod_Category_Name").isNull).count() == 610)
    // underscore → space + initcap on a real category value
    val perfumaria = silver.filter(col("Prod_ID") === "1e9e8ef04dbcff4541ed26657ea517e5").head()
    assert(perfumaria.getAs[String]("Prod_Category_Name") == "Perfumaria")

    val dim = GoldDims.dimProducts(silver).cache()
    assert(dim.count() == 32951)
    assert(dim.select("Product_SK").distinct().count() == 32951, "surrogate keys unique")

    // weight bands partition the real distribution; NULL weight → Unknown
    val bands = dim.groupBy("Product_Weight_Category").count().collect()
      .map(r => r.getAs[String]("Product_Weight_Category") -> r.getAs[Long]("count")).toMap
    assert(bands("Light") == 12464, "weight < 500 g on real data")
    assert(bands("Unknown") == 2, "exactly the 2 null-weight products")
    assert(bands.values.sum == 32951)
    assert(bands("Light") + bands("Medium") + bands("Heavy") == 32949)

    // H×W×L volume arithmetic on a real row (16 × 10 × 14 cm)
    val vol = dim.filter(col("Product_ID") === "1e9e8ef04dbcff4541ed26657ea517e5").head()
    assert(vol.getAs[Number]("Product_Volume_CM3").intValue() == 16 * 10 * 14)
    assert(vol.getAs[String]("Product_Weight_Category") == "Light") // 225 g

    // null dims propagate to null volume, never to a fake 0
    val nullDims = dim.filter(col("Product_Height_CM").isNull)
    assert(nullDims.count() == 2)
    assert(nullDims.filter(col("Product_Volume_CM3").isNotNull).count() == 0)
    silver.unpersist(); dim.unpersist()
  }

  test("real sellers CSV: row counts, city initcap, zip-band regions") {
    val bronze = Bronze.readCsv(spark, s"$dataDir/olist_sellers_dataset.csv", "sellers")
    assert(bronze.count() == 3095)

    val silver = Silver.cleanSellers(bronze).cache()
    assert(silver.count() == 3095)
    val first = silver.filter(col("Sell_ID") === "3442f8959a84dea7ee197c632cb2df15").head()
    assert(first.getAs[String]("Sell_City") == "Campinas") // initcap on real lowercase

    val dim = GoldDims.dimSellers(silver).cache()
    assert(dim.count() == 3095)
    assert(dim.select("Seller_SK").distinct().count() == 3095)

    // zip band 13023 (Campinas/SP) → Southeast; 20031 (Rio/RJ) lands in the
    // reference's quirky 20000-39999 → "Northeast" band (faithfully preserved)
    val campinas = dim.filter(col("Seller_ID") === "3442f8959a84dea7ee197c632cb2df15").head()
    assert(campinas.getAs[String]("Seller_Region") == "Southeast")
    val rio = dim.filter(col("Seller_ID") === "ce3ad9de960102d0677a81f5d0bb7b2d").head()
    assert(rio.getAs[String]("Seller_Region") == "Northeast")

    // every real zip prefix falls in a band — no Unknown on this dataset
    assert(dim.filter(col("Seller_Region") === "Unknown").count() == 0)
    silver.unpersist(); dim.unpersist()
  }
}
