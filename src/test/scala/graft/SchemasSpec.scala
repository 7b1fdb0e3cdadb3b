package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.{col, split, sum, year}
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

  test("Catalog: a jdbc: root reads tables through Spark's JDBC " +
      "source — same registry API, database backing store") {
    // in-JVM Derby (ships with Spark's jars) stands in for the
    // reference's live Postgres; create=true materializes it
    val url = "jdbc:derby:memory:graftcat;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE region (r_regionkey INT, r_name VARCHAR(32))")
      st.execute("INSERT INTO region VALUES (0,'AFRICA'),(1,'AMERICA')")
      st.close()
      val cat = graft.model.Catalog(spark, url)
      assert(cat.isJdbc)
      assert(cat.columnsOf("region").map(_.toLowerCase) ==
        Seq("r_regionkey", "r_name"))
      assert(cat.hasColumn("region", "R_NAME"))
      assert(cat("region").count() == 2)
      // filters reach the JDBC source, not a post-scan filter only
      val filtered = cat("region")
        .filter(col("R_REGIONKEY") === 1).collect()
      assert(filtered.map(_.getAs[String]("R_NAME")).toSeq ==
        Seq("AMERICA"))
      // and the parquet path is untouched by the seam
      assert(!graft.model.Catalog(spark, "/root/testdata/sf0.001").isJdbc)
    } finally {
      conn.close()
      // drop the in-memory db so reruns in one JVM start clean
      scala.util.Try(java.sql.DriverManager
        .getConnection("jdbc:derby:memory:graftcat;drop=true"))
    }
  }

  test("Catalog JDBC: partitionColumn options fan the scan out into " +
      "parallel range partitions") {
    val url = "jdbc:derby:memory:graftpar;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE nums (k INT, v VARCHAR(8))")
      (0 until 40).grouped(10).foreach { g =>
        st.execute("INSERT INTO nums VALUES " +
          g.map(i => s"($i, 'v$i')").mkString(", "))
      }
      st.close()
      val cat = graft.model.Catalog(spark, url, Map(
        "partitionColumn" -> "k", "lowerBound" -> "0",
        "upperBound" -> "40", "numPartitions" -> "4"))
      val df = cat("nums")
      // the whole point of the jdbcOptions seam: N cursors, not one
      assert(df.rdd.getNumPartitions == 4, df.rdd.getNumPartitions)
      assert(df.count() == 40)
    } finally {
      conn.close()
      scala.util.Try(java.sql.DriverManager
        .getConnection("jdbc:derby:memory:graftpar;drop=true"))
    }
  }

  test("Catalog JDBC: PostgreSQL-shaped columns (uuid / text[] / " +
      "timestamptz / numeric) arrive typed and usable") {
    // the reference's store is Postgres 17 (backup_before_fix.sql:5)
    // with uuid / text[] / timestamptz / numeric columns (sql:42-525).
    // Derby stands in with the closest embedded types per the dialect
    // map in Catalog's scaladoc: CHAR(36) carries the uuid's exact
    // textual shape, a delimited VARCHAR carries the array until the
    // PostgresDialect's native ArrayType takes over on a live pg,
    // TIMESTAMP matches how the pg driver surfaces timestamptz
    // instants, DECIMAL(12,2) matches numeric(12,2).
    val url = "jdbc:derby:memory:graftpg;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE product_collection (
        |  id CHAR(36) NOT NULL,
        |  img_array VARCHAR(200),
        |  created_on TIMESTAMP,
        |  price DECIMAL(12,2))""".stripMargin)
      st.execute("INSERT INTO product_collection VALUES " +
        "('0b9bb528-43b2-4af1-9a43-ed5a5b1f1a4e', 'a.jpg,b.jpg', " +
        "  TIMESTAMP('2024-01-15 10:30:00'), 1299.50), " +
        "('90b74a9b-67e1-4f60-b9a4-2dce2b8c3a11', NULL, " +
        "  TIMESTAMP('2024-02-01 08:00:00'), 49.90)")
      st.close()
      val df = graft.model.Catalog(spark, url)("product_collection")
      import org.apache.spark.sql.types._
      // arrival types through the generic JDBC dialect
      assert(df.schema("ID").dataType == StringType)
      assert(df.schema("CREATED_ON").dataType == TimestampType)
      assert(df.schema("PRICE").dataType == DecimalType(12, 2))
      // uuid stays the exact 36-char text deterministicId also emits
      val ids = df.select(col("ID")).collect().map(_.getString(0))
      assert(ids.forall(_.matches(
        "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
      // the array round-trips: split gives ArrayType rows; NULL
      // array stays NULL (not an empty array)
      val arr = df
        .select(col("ID"), split(col("IMG_ARRAY"), ",").as("imgs"))
        .orderBy("ID").collect()
      assert(arr(0).getSeq[String](1) == Seq("a.jpg", "b.jpg"))
      assert(arr(1).isNullAt(1))
      // timestamp arithmetic works on the arrival type
      val years = df.select(year(col("CREATED_ON"))).orderBy("ID")
        .collect().map(_.getInt(0)).toSeq
      assert(years == Seq(2024, 2024))
      // numeric survives exactly (no double round-trip)
      val cents = df
        .select(sum(col("PRICE") * 100).cast("long")).collect()(0)
      assert(cents.getLong(0) == 134940L)
    } finally {
      conn.close()
      scala.util.Try(java.sql.DriverManager
        .getConnection("jdbc:derby:memory:graftpg;drop=true"))
    }
  }

  test("evolveTo twice is a no-op (idempotent schema evolution)") {
    val df = Seq((1L, "x")).toDF("inventory", "extra")
    val once = Schemas.evolveTo(df, Schemas.product)
    val twice = Schemas.evolveTo(once, Schemas.product)
    assert(once.columns.toSeq == twice.columns.toSeq)
    assertSameRows(once, twice)
  }
}
