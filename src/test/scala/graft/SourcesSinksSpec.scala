package graft

import graft.sinks.EsBulkSink
import graft.sources.Readers
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSinksSpec extends SparkTestBase {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("menu CSV reads with explicit schema and captures malformed rows") {
    val dir = tmpDir("graft-csv")
    Files.writeString(java.nio.file.Paths.get(s"$dir/menu.csv"),
      """name,category,subcategory,description,price
        |Margherita,Pizza,Classic,Tomato and mozzarella,12.50$
        |"Broken,row,with,way,too,many,columns,oops",x,y,z,1,2,3,4
        |Carbonara,Pasta,,,"9.90"
        |""".stripMargin)
    val df = Readers.menuCsv(spark, s"$dir/menu.csv").cache()
    assert(df.count() == 3)
    assert(df.schema.fieldNames.toSeq ==
      Seq("name", "category", "subcategory", "description", "price", "_corrupt"))
    assert(df.filter(col("_corrupt").isNotNull).count() == 1)
    assert(df.filter(col("name") === "Margherita" && col("price") === "12.50$").count() == 1)
  }

  test("articles NDJSON round-trips through the explicit schema") {
    val dir = tmpDir("graft-json")
    Files.writeString(java.nio.file.Paths.get(s"$dir/articles.json"),
      """{"article_id": "a1", "name": "Rice 1kg", "brand": "Acme", "upc": "036000291452", "price": "3.20", "qte_main": 7.0}
        |{"article_id": "a2", "name": "Beans", "price": "1.10"}
        |not json at all
        |""".stripMargin)
    val df = Readers.articlesJson(spark, s"$dir/articles.json").cache()
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt").isNotNull).count() == 1)
    assert(df.filter(col("article_id") === "a2")
      .select("brand").head().isNullAt(0)) // missing field → null, not failure
  }

  test("mdb-export Articles contract: quoted commas, empty→null, typed coercion") {
    import spark.implicits._
    val lines = Seq(
      (1L, "000000000010,\"Rice, Long Grain\",3.20,7,1"),
      (2L, "000000000011,Beans,,2,0"))
      .toDF("id", "line")
    val parsed = Readers.parseMdbArticleLines(lines, "line").cache()
    assert(parsed.columns.toSeq ==
      Seq("id", "article_id", "product_name", "price", "quantity", "is_tax"))
    val r1 = parsed.filter(col("id") === 1L).head()
    assert(r1.getAs[String]("product_name") == "Rice, Long Grain") // RFC-4180 quote
    assert(r1.getAs[Double]("price") == 3.2)
    assert(r1.getAs[Boolean]("is_tax"))
    val r2 = parsed.filter(col("id") === 2L).head()
    assert(r2.isNullAt(r2.fieldIndex("price"))) // empty field → null
    assert(r2.getAs[Double]("quantity") == 2.0)
    assert(!r2.getAs[Boolean]("is_tax"))
  }

  test("mdb-export Articles CSV file reader applies the explicit schema") {
    val dir = tmpDir("graft-mdb")
    Files.writeString(java.nio.file.Paths.get(s"$dir/articles.csv"),
      """Article,Description,PrixVente,QteMain,Taxe2
        |000000000010,"Rice, Long Grain",3.20,7,1
        |000000000011,Beans,,2,0
        |""".stripMargin)
    val df = Readers.mdbArticlesCsv(spark, s"$dir/articles.csv").cache()
    assert(df.count() == 2)
    assert(df.filter(col("Description") === "Rice, Long Grain").count() == 1)
    assert(df.filter(col("_corrupt").isNotNull).count() == 0)
  }

  test("ES bulk response accounting: ok/permanent/retryable split and retry queue") {
    import spark.implicits._
    val items = Seq(
      (0L, """{"index": {"_id": "p1", "status": 201}}"""),
      (0L, """{"index": {"_id": "p2", "status": 429}}"""),
      (0L, """{"index": {"_id": "p3", "status": 400, "error": {"type": "mapper_parsing_exception", "reason": "bad field"}}}"""),
      (1L, """{"index": {"_id": "p4", "status": 200}}"""),
      (1L, """{"index": {"_id": "p5", "status": 503}}"""))
      .toDF("batch_id", "line")
    val acct = EsBulkSink.bulkAccounting(items, "batch_id", "line")
      .orderBy("batch_id").collect()
    assert(acct.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((0L, 3L, 1L, 1L, 1L), (1L, 2L, 1L, 0L, 1L)))
    val retry = EsBulkSink.retryQueue(items, "line").as[String].collect().sorted.toSeq
    assert(retry == Seq("p2", "p5"))
    // permanent failures surface their error type
    val parsed = EsBulkSink.parseBulkResponseItems(items, "line")
    assert(parsed.filter(col("_id") === "p3").head()
      .getAs[String]("error_type") == "mapper_parsing_exception")
  }

  test("ES bulk sink writes two NDJSON lines per document, id in the action line") {
    import spark.implicits._
    val docs = Seq(
      ("p1", "Margherita", 12.5),
      ("p2", "Carbonara", 9.9))
      .toDF("product_id", "product_name", "price")
    val out = tmpDir("graft-es") + "/bulk"
    EsBulkSink.write(docs, "products", "product_id", out)

    val lines = spark.read.text(out).as[String].collect().toSeq
    assert(lines.length == 4)
    val actions = lines.filter(_.startsWith("""{"index":"""))
    assert(actions.length == 2)
    assert(actions.exists(_.contains(""""_id":"p1"""")))
    assert(actions.forall(_.contains(""""_index":"products"""")))
    // doc lines are valid JSON with the non-id fields
    val docsBack = spark.read.json(
      spark.createDataset(lines.filterNot(_.startsWith("""{"index":"""))))
    assert(docsBack.columns.sorted.toSeq == Seq("price", "product_name"))
    assert(docsBack.count() == 2)
  }

  test("ORC round-trips losslessly and the scan pushes filters + prunes columns") {
    val dir = tmpDir("graft-orc")
    val src = Tables.part(spark, sfDir)
    Readers.writeOrc(src, s"$dir/part.orc")
    val back = Readers.orc(spark, s"$dir/part.orc",
      org.apache.spark.sql.types.StructType.fromDDL(src.schema.toDDL))
    assert(back.count() == src.count())
    // lossless: same rows under the same ordering
    assert(back.orderBy("p_partkey").collect().toSeq ==
      src.orderBy("p_partkey").collect().toSeq)
    // pushdown + pruning reach the ORC scan exactly like parquet
    val q = back.filter(col("p_size") > 40).select("p_partkey", "p_size")
    q.write.format("noop").mode("overwrite").save()
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(p_size"),
      s"no pushed filter in ORC scan:\n$scan")
    assert(scan.contains("ReadSchema: struct<p_partkey:bigint,p_size:"),
      s"ORC scan did not prune columns:\n$scan")
  }
}
