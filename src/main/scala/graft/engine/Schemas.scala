package graft.engine

import org.apache.spark.sql.types._

/** Explicit StructTypes for the 9 Olist source tables (FIXTURES.md §A).
  *
  * The reference infers every schema (`spark_jobs/ingestion.py:12`
  * `inferSchema=true`), which drifts on zip codes with leading zeros and on
  * review dates; we pin schemas and treat inference as opt-in (SURVEY §1.2).
  */
object Schemas {

  val customers: StructType = StructType(Seq(
    StructField("customer_id", StringType),
    StructField("customer_unique_id", StringType),
    StructField("customer_zip_code_prefix", IntegerType),
    StructField("customer_city", StringType),
    StructField("customer_state", StringType)))

  val orders: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("customer_id", StringType),
    StructField("order_status", StringType),
    StructField("order_purchase_timestamp", TimestampType),
    StructField("order_approved_at", TimestampType),
    StructField("order_delivered_carrier_date", TimestampType),
    StructField("order_delivered_customer_date", TimestampType),
    StructField("order_estimated_delivery_date", TimestampType)))

  val orderItems: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("order_item_id", IntegerType),
    StructField("product_id", StringType),
    StructField("seller_id", StringType),
    StructField("shipping_limit_date", TimestampType),
    StructField("price", DoubleType),
    StructField("freight_value", DoubleType)))

  val orderPayments: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("payment_sequential", IntegerType),
    StructField("payment_type", StringType),
    StructField("payment_installments", IntegerType),
    StructField("payment_value", DoubleType)))

  val orderReviews: StructType = StructType(Seq(
    StructField("review_id", StringType),
    StructField("order_id", StringType),
    StructField("review_score", IntegerType),
    StructField("review_comment_title", StringType),
    StructField("review_comment_message", StringType),
    StructField("review_creation_date", StringType), // regex-validated, see Silver
    StructField("review_answer_timestamp", TimestampType)))

  val products: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("product_category_name", StringType),
    StructField("product_name_lenght", IntegerType), // sic — misspelled in source
    StructField("product_description_lenght", IntegerType),
    StructField("product_photos_qty", IntegerType),
    StructField("product_weight_g", IntegerType),
    StructField("product_length_cm", IntegerType),
    StructField("product_height_cm", IntegerType),
    StructField("product_width_cm", IntegerType)))

  val sellers: StructType = StructType(Seq(
    StructField("seller_id", StringType),
    StructField("seller_zip_code_prefix", IntegerType),
    StructField("seller_city", StringType),
    StructField("seller_state", StringType)))

  val geolocation: StructType = StructType(Seq(
    StructField("geolocation_zip_code_prefix", IntegerType),
    StructField("geolocation_lat", DoubleType),
    StructField("geolocation_lng", DoubleType),
    StructField("geolocation_city", StringType),
    StructField("geolocation_state", StringType)))

  val categoryTranslation: StructType = StructType(Seq(
    StructField("product_category_name", StringType),
    StructField("product_category_name_english", StringType)))

  /** name → schema, keyed like the reference's table dict (`ingestion.py:27-37`). */
  val olist: Map[String, StructType] = Map(
    "customers" -> customers,
    "orders" -> orders,
    "order_items" -> orderItems,
    "order_payments" -> orderPayments,
    "order_reviews" -> orderReviews,
    "products" -> products,
    "sellers" -> sellers,
    "geolocation" -> geolocation,
    "product_category_name_translation" -> categoryTranslation)
}
