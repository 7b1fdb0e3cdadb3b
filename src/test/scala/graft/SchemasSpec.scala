package graft

import org.apache.spark.sql.types._
import graft.model.Schemas

class SchemasSpec extends SparkSpec {
  import spark.implicits._

  test("registry covers the reference's table families") {
    assert(Schemas.all.size >= 25)
    // every table carries the timestamp pair (M7 convention)
    Schemas.all.values.foreach { s =>
      assert(s.fieldNames.contains("created_on"))
      assert(s.fieldNames.contains("modified_on"))
    }
    assert(Schemas.product.fieldNames.contains("product_collection_sku"))
    assert(Schemas.productCollection("images").dataType ==
      ArrayType(StringType))
  }

  test("evolveTo: adds typed nulls, keeps extras, orders target-first") {
    val df = Seq((1L, "x")).toDF("inventory", "extra")
    val out = Schemas.evolveTo(df, Schemas.productAttributeKeys)
    assert(out.columns.take(2).toSeq == Seq("id", "attr_key"))
    assert(out.columns.contains("extra"))
    assert(out.schema("attr_key").dataType == StringType)
    val r = out.collect()(0)
    assert(r.getAs[Any]("id") == null)
    assert(r.getAs[String]("extra") == "x")
  }

  test("Catalog: table load, column discovery, existence probe") {
    val cat = graft.model.Catalog(spark, "/root/testdata/sf0.001")
    assert(cat.columnsOf("region") == Seq("r_regionkey", "r_name"))
    assert(cat.hasColumn("orders", "o_orderkey"))
    assert(!cat.hasColumn("orders", "nope"))
    assert(cat("region").count() == 5)
  }

  test("evolveTo twice is a no-op (idempotent schema evolution)") {
    val df = Seq((1L, "x")).toDF("inventory", "extra")
    val once = Schemas.evolveTo(df, Schemas.product)
    val twice = Schemas.evolveTo(once, Schemas.product)
    assert(once.columns.toSeq == twice.columns.toSeq)
    assertSameRows(once, twice)
  }
}
